"""BENCH_EXTRA merge semantics (VERDICT r4 item 1a): keys not
re-measured in a run carry forward from the on-disk record with the
run id that measured them, run-local keys never carry, and this run's
measurements win over carried ones."""

import importlib.util
import json
import os
import sys


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = ["bench.py"]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old_argv
    return mod


def test_merge_carries_unmeasured_keys(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    b = _load_bench()
    prior = {
        "denoise_s": 100.0,
        "vae_s": 7.6,
        "extras_skipped": ["vae_int8"],      # run-local: must not carry
        "elapsed_total_s": 1346.0,           # run-local: must not carry
        "run_id": "r-old",
        "_provenance": {"denoise_s": "r-old", "vae_s": "r-old"},
    }
    with open("BENCH_EXTRA.json", "w") as f:
        json.dump(prior, f)
    b._load_prior_extra()

    extra = {"denoise_s": 99.0}              # re-measured this run
    merged = b.merged_extra(extra)

    assert merged["denoise_s"] == 99.0       # this run wins
    assert merged["vae_s"] == 7.6            # carried forward
    assert "extras_skipped" not in merged    # run-local dropped
    assert "elapsed_total_s" not in merged
    prov = merged["_provenance"]
    assert prov["denoise_s"] == b._RUN_ID    # provenance re-tagged
    assert prov["vae_s"] == "r-old"          # carried provenance kept
    assert merged["run_id"] == b._RUN_ID


def test_merge_without_prior_file(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    b = _load_bench()
    b._load_prior_extra()                    # no file: no-op
    merged = b.merged_extra({"vae_s": 7.6})
    assert merged["vae_s"] == 7.6
    assert merged["_provenance"]["vae_s"] == b._RUN_ID


def test_dump_writes_trailing_newline(tmp_path, monkeypatch):
    # round-4 ADVICE item: line-oriented tooling needs the newline
    monkeypatch.chdir(tmp_path)
    b = _load_bench()
    b._dump_extra({"vae_s": 7.6})
    raw = open("BENCH_EXTRA.json", "rb").read()
    assert raw.endswith(b"\n")
    assert json.loads(raw)["vae_s"] == 7.6
