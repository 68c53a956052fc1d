import sys

from deepcv_tpu.cli import main

sys.exit(main())
