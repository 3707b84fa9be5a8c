"""Parallel-mode (para_*) phase API tests — mirrors the reference's
parallel e2e flow (``tests/test_end_to_end_run.py:121-187``: init →
N workers → collect) with 1, 3 and 10 bins."""

import os

import pytest

from data_linter_ray.pipelines.parallel import (
    bin_pack_files,
    para_collect_all_logs,
    para_collect_all_status,
    para_run_init,
    para_run_validation,
)

META = {
    "name": "table1",
    "columns": [
        {"name": "my_int", "type": "int64", "minimum": 10, "maximum": 20},
        {"name": "animal", "type": "string", "enum": ["cat", "dog"]},
    ],
}


def make_cfg(tmp_path, n_good=4, n_bad=2):
    land = tmp_path / "land"
    land.mkdir()
    for i in range(n_good):
        (land / f"table1_g{i}.csv").write_text("my_int,animal\n10,cat\n15,dog\n")
    for i in range(n_bad):
        (land / f"table1_b{i}.csv").write_text("my_int,animal\n99,robot\n")
    return {
        "land-base-path": str(land) + "/",
        "pass-base-path": str(tmp_path / "pass") + "/",
        "fail-base-path": str(tmp_path / "fail") + "/",
        "log-base-path": str(tmp_path / "log") + "/",
        "tables": {"table1": {"metadata": META}},
    }


@pytest.mark.parametrize("bins", [1, 3, 10])
def test_para_flow(ray_session, tmp_path, bins):
    cfg = make_cfg(tmp_path)
    dirs = para_run_init(cfg, bins)
    assert 1 <= len(dirs) <= bins
    for i in range(bins):  # workers beyond the bin count must no-op
        para_run_validation(i, cfg)
    res = para_collect_all_status(cfg)
    assert not res.all_tables_passed
    assert len(res.manifests) == 6
    assert sum(1 for m in res.manifests if m.valid) == 4
    assert len(os.listdir(tmp_path / "pass" / "table1")) == 4
    assert len(os.listdir(tmp_path / "fail" / "table1")) == 2
    summary = para_collect_all_logs(cfg)
    assert summary["fail_count"] == 2
    assert not os.path.exists(tmp_path / "log" / "data_linter_temporary_fs" / "configs")


def test_bin_pack_ffd():
    files = [("t", f"f{i}", size) for i, size in enumerate([100, 90, 50, 40, 10, 5])]
    bins = bin_pack_files(files, 3)
    assert sum(len(b) for b in bins) == 6  # no dropped files (reference bug)
    loads = sorted(sum(dict(((t, f), s) for t, f, s in files)[(t, f)] for t, f in b) for b in bins)
    assert loads == [95, 100, 100]  # balanced


def test_bin_pack_more_bins_than_files():
    bins = bin_pack_files([("t", "a", 1)], 10)
    assert bins == [[("t", "a")]]
