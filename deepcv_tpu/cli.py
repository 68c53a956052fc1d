"""Command-line interface.

Reference parity: /root/reference/kedro_cli.py — ``kedro run --pipeline=X
--params k:v`` (:157-231), ``kedro test`` (pytest wrapper), plus framework
additions: ``bench``, ``describe``.

Usage::

    python -m deepcv_tpu run --pipeline=train_image_classifier \
        --params train_image_classifier.epochs:1
    python -m deepcv_tpu list
    python -m deepcv_tpu describe --pipeline=train_image_classifier
    python -m deepcv_tpu test [pytest args...]
    python -m deepcv_tpu bench
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path
from typing import Any, Dict, List

__all__ = ["main"]


def _parse_extra_params(entries: List[str]) -> Dict[str, Any]:
    """``--params a.b:3,c:x`` -> {'a.b': 3, 'c': 'x'} (kedro_cli.py:122-141)."""
    import yaml

    out: Dict[str, Any] = {}
    for entry in entries:
        for pair in entry.split(","):
            if not pair.strip():
                continue
            if ":" not in pair:
                raise SystemExit(f"--params entry '{pair}' must be 'dotted.key:value'")
            k, v = pair.split(":", 1)
            out[k.strip()] = yaml.safe_load(v.strip())
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="deepcv_tpu", description="TPU-native DeepCV framework CLI")
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="run a pipeline")
    p_run.add_argument("--pipeline", default="__default__")
    p_run.add_argument("--params", action="append", default=[],
                       help="extra params: dotted.key:value[,key:value...]")
    p_run.add_argument("--project-path", default=".")
    p_run.add_argument("--env", default=None, help="extra conf env dir under conf/")

    p_list = sub.add_parser("list", help="list registered pipelines")
    p_list.add_argument("--project-path", default=".")

    p_desc = sub.add_parser("describe", help="describe a pipeline")
    p_desc.add_argument("--pipeline", default="__default__")
    p_desc.add_argument("--project-path", default=".")

    sub.add_parser("test", help="run the test suite (extra args pass to pytest)")
    sub.add_parser("bench", help="run the headline benchmark")

    args, rest = parser.parse_known_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    if args.command == "test":
        import pytest
        return pytest.main(rest or ["tests/", "-q"])

    if args.command == "bench":
        import runpy
        runpy.run_path(str(Path(__file__).resolve().parent.parent / "bench.py"),
                       run_name="__main__")
        return 0

    from deepcv_tpu.pipelines import ProjectContext

    if args.command == "list":
        ctx = ProjectContext(args.project_path)
        for name, p in sorted(ctx.pipelines.items()):
            print(f"{name:45s} tags={sorted(p.tags)} nodes={[n.name for n in p.nodes]}")
        return 0

    if args.command == "describe":
        ctx = ProjectContext(args.project_path)
        print(ctx.pipelines[args.pipeline].describe())
        return 0

    if args.command == "run":
        conf_paths = [Path(args.project_path) / "conf" / "base",
                      Path(args.project_path) / "conf" / "local"]
        if args.env:
            conf_paths.append(Path(args.project_path) / "conf" / args.env)
        ctx = ProjectContext(args.project_path, conf_paths=conf_paths,
                             extra_params=_parse_extra_params(args.params))
        store = ctx.run(args.pipeline)
        results = store.get("train_results")
        if results and "history" in results:
            h = results["history"]
            last_val = h["valid"][-1] if h["valid"] else {}
            print(f"pipeline '{args.pipeline}' finished: steps={h['steps']} "
                  f"{last_val}")
        return 0

    return 1  # pragma: no cover


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
