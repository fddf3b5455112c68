"""Managed scratch-space contract (scratch.py): directories nest under
one per-process root, survive until asked, and cleanup is idempotent."""

from __future__ import annotations

import os

from rds_glue_s3_etl_pipeline_spark import scratch


def test_scratch_dirs_nest_under_root_and_cleanup():
    a = scratch.scratch_dir("unit_a_")
    b = scratch.scratch_dir("unit_b_")
    root = scratch.scratch_root()
    assert os.path.isdir(a) and os.path.isdir(b)
    assert os.path.dirname(a) == root and os.path.dirname(b) == root
    assert a != b
    scratch.cleanup_now()
    assert not os.path.exists(root)
    # idempotent; next request recreates a fresh root
    scratch.cleanup_now()
    c = scratch.scratch_dir("unit_c_")
    assert os.path.isdir(c)
    assert scratch.scratch_root() != root or os.path.isdir(c)
    scratch.cleanup_now()


def test_scratch_root_recreated_if_deleted():
    import shutil

    r1 = scratch.scratch_root()
    shutil.rmtree(r1, ignore_errors=True)
    d = scratch.scratch_dir("unit_d_")
    assert os.path.isdir(d)
    scratch.cleanup_now()
