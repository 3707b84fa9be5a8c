"""Small path/file utilities (reference parity:
``/root/reference/data_linter/utils.py``)."""

from __future__ import annotations

import os
from typing import Optional


def get_out_path(
    basepath: str,
    table: str,
    ts: str,
    filename: str,
    compress: bool = False,
    filenum: int = 0,
    timestamp_partition_name: Optional[str] = None,
) -> str:
    """Routed-output naming incl. hive-style timestamp partition
    (reference ``get_out_path``, utils.py:62-83):
    ``{base}/{table}/[{tpn}={ts}/]{file}-{filenum}-{ts}[.gz]``."""
    filename_only, ext = filename.split(".", 1)
    final_filename = f"{filename_only}-{filenum}-{ts}.{ext}"
    if compress and not ext.endswith(".gz"):
        final_filename += ".gz"
    if timestamp_partition_name:
        return os.path.join(
            basepath, table, f"{timestamp_partition_name}={ts}", final_filename
        )
    return os.path.join(basepath, table, final_filename)


def get_table_log_path(basepath: str, table: str, ts: str, filenum: int = 0) -> str:
    """Reference ``get_table_log_path`` (utils.py:86-90)."""
    return os.path.join(basepath, "tables", table, f"log-{table}-{filenum}-{ts}.json")


def read_all_file_body(path: str) -> str:
    """Whole-file utf-8 read, local or object store (reference
    ``read_all_file_body``, utils.py:180-204)."""
    from data_linter_ray import fs

    return fs.read_text(path)


def generate_iam_config(
    config: dict,
    iam_config_output: str = "iam_config.yaml",
    iam_policy_output: Optional[str] = None,
    overwrite_config: bool = False,
) -> dict:
    """Generate the reference-shaped IAM config YAML from a run config
    (reference ``data_linter/iam.py:7-63``). The optional policy-JSON step
    requires the external ``iam_builder`` package and is gated behind an
    import-try (not available in this environment)."""
    import yaml

    if os.path.exists(iam_config_output) and overwrite_config is not True:
        raise ValueError(
            f"{iam_config_output} exists: to overwrite set overwrite_config=True"
        )

    log_path = config["log-base-path"].replace("s3://", "")
    land_path = config["land-base-path"].replace("s3://", "")
    pass_path = config["pass-base-path"].replace("s3://", "")
    read_write = [os.path.join(land_path, "*"), os.path.join(pass_path, "*")]
    if config.get("fail-base-path"):
        read_write.append(os.path.join(config["fail-base-path"].replace("s3://", ""), "*"))

    out_iam = {
        "iam-role-name": config["iam-role-name"],
        "athena": {"write": True},
        "s3": {"write_only": [os.path.join(log_path, "*")], "read_write": read_write},
    }
    with open(iam_config_output, "w") as f:
        yaml.dump(out_iam, f)

    if iam_policy_output:
        if not iam_policy_output.endswith(".json"):
            raise ValueError("iam_policy_path should be a json file")
        try:
            import json

            from iam_builder.iam_builder import build_iam_policy  # type: ignore

            with open(iam_policy_output, "w") as f:
                json.dump(build_iam_policy(out_iam), f, indent=4, separators=(",", ": "))
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "iam_builder is not installed; policy JSON generation unavailable"
            ) from e
    return out_iam
