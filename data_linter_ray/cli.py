"""CLI entry: ``python -m data_linter_ray --config config.yaml``.

Parity with the reference CLI (``/root/reference/data_linter/command_line.py:6-16``).
Owns the Ray session (library code never calls ray.init).

Cluster launch (the north-rule deployment shape):

    ray job submit --working-dir . -- \\
        python -m data_linter_ray --config s3://bucket/config.yaml

Under ``ray job submit`` the job runtime sets RAY_ADDRESS, so the CLI
connects to the submitting cluster; standalone it runs a local session.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    import data_linter_ray as dlr

    p = argparse.ArgumentParser(prog="data_linter_ray")
    # reference parity: -v/--version (command_line.py:8-13)
    p.add_argument(
        "-v",
        "--version",
        action="version",
        version=f"%(prog)s {dlr.__version__}",
    )
    p.add_argument("--config", "-c", required=True, help="YAML run config")
    p.add_argument("--resume", action="store_true", help="skip committed units")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        import logging

        from ray.data import DataContext

        logging.getLogger("ray.data").setLevel(logging.ERROR)
        DataContext.get_current().enable_progress_bars = False
        from data_linter_ray.pipelines.run import run_validation

        result = run_validation(args.config, resume=args.resume)
        print(
            f"all_tables_passed={result.all_tables_passed} "
            f"units={len(result.manifests)}"
        )
        return 0 if result.all_tables_passed else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
