"""Reserved YAML architecture-spec tokens.

Reference parity: ``deepcv.meta.nn_spec.yaml_tokens`` enum
(/root/reference/src/deepcv/meta/nn_spec.py:35-50). The reference's own
parameter files write the nested-module token as ``_nested_deepcvmodule``
(conf/base/parameters.yml:85) while the enum spells ``_nested_deepcv_module``;
we accept both.
"""


class YamlTokens:
    FROM = "_from"
    NAME = "_name"
    NAS_LAYER_CHOICE = "_nas_layer_choice"
    NESTED_DEEPCV_MODULE = "_nested_deepcv_module"
    NESTED_DEEPCV_MODULE_ALT = "_nested_deepcvmodule"
    FROM_NAS_INPUT_CHOICE = "_from_nas_input_choice"
    REDUCTION = "_reduction"
    NEW_BRANCH_FROM_TENSOR = "_new_branch_from_tensor"
    N_CHOSEN = "_n_chosen"
    RETURN_MASK = "_return_mask"
    CANDIDATES = "_candidates"

    ALL = (FROM, NAME, NAS_LAYER_CHOICE, NESTED_DEEPCV_MODULE,
           NESTED_DEEPCV_MODULE_ALT, FROM_NAS_INPUT_CHOICE, REDUCTION,
           NEW_BRANCH_FROM_TENSOR, N_CHOSEN, RETURN_MASK, CANDIDATES)
