"""Resume-from-manifest equivalence (FIXTURES.md invariant #1/#5)."""

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocracle_ray.sources.pages import pages_table
from ocracle_ray.pipelines.manifest import manifest_is_valid, run_partitioned


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_shards")
    for s in range(4):
        t = pages_table(s * 30, 30)
        pq.write_table(t, os.path.join(d, f"shard-{s:02d}.parquet"))
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def _records_df(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    df = pd.concat([pd.read_parquet(f, columns=["url", "text_fingerprint"]) for f in files])
    return df.sort_values("url").reset_index(drop=True)


def test_fresh_run_writes_manifests(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    summary = run_partitioned(sharded_input, out, concurrency=2)
    assert summary["partitions"] == 4
    assert summary["ran"] == 4 and summary["skipped"] == 0
    assert summary["totals"]["rows_in"] == 120
    assert summary["totals"]["errors"] == 0
    # counters sum to input rows: out + deduped == in (no silent drops)
    dd = sum(m["rows_deduped"] for m in summary["manifests"])
    assert summary["totals"]["rows_out"] + dd == 120
    for pid in range(4):
        assert manifest_is_valid(out, pid, summary["manifests"][pid]["input_files"])


def test_resume_skips_done_and_matches_fresh(sharded_input, tmp_path):
    fresh_dir = str(tmp_path / "fresh")
    fresh = run_partitioned(sharded_input, fresh_dir, concurrency=2)

    resume_dir = str(tmp_path / "resume")
    first = run_partitioned(sharded_input, resume_dir, concurrency=2)
    # simulate a crash: partition 2 loses its manifest and output
    os.remove(os.path.join(resume_dir, "manifest", "part-00002.json"))
    shutil.rmtree(os.path.join(resume_dir, "part-00002"))
    second = run_partitioned(sharded_input, resume_dir, concurrency=2)
    assert second["ran"] == 1 and second["skipped"] == 3

    # resume ≡ fresh, byte-identically (url -> fingerprint maps equal)
    pd.testing.assert_frame_equal(_records_df(fresh_dir), _records_df(resume_dir))
    assert fresh["totals"]["checksum"] == second["totals"]["checksum"]
    assert first["totals"]["checksum"] == second["totals"]["checksum"]


def test_stale_manifest_reruns(sharded_input, tmp_path):
    out = str(tmp_path / "out2")
    run_partitioned(sharded_input, out, concurrency=2)
    # corrupt a manifest -> that partition must rerun
    p = os.path.join(out, "manifest", "part-00001.json")
    with open(p) as f:
        m = json.load(f)
    m["input_files"] = ["/nonexistent"]
    with open(p, "w") as f:
        json.dump(m, f)
    summary = run_partitioned(sharded_input, out, concurrency=2)
    assert summary["ran"] == 1 and summary["skipped"] == 3
