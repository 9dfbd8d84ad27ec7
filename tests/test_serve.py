"""Serving daemon (kandinsky5_tpu/serve.py) against a fake pipeline."""

import json
import time
import urllib.request

import pytest

from kandinsky5_tpu.serve import GenerationServer


class FakePipeline:
    """Records batches; writes a marker file per save path."""

    def __init__(self, delay=0.0, fail_on=None):
        self.calls = []
        self.delay = delay
        self.fail_on = fail_on or set()

    def __call__(self, prompts, save_path=None, **kw):
        time.sleep(self.delay)
        self.calls.append(list(prompts))
        for p, path in zip(prompts, save_path):
            if p in self.fail_on:
                raise RuntimeError(f"bad prompt: {p}")
            with open(path, "wb") as f:
                f.write(b"\x00fakevideo:" + p.encode())


def _req(port, path, payload=None):
    url = f"http://127.0.0.1:{port}{path}"
    if payload is None:
        with urllib.request.urlopen(url, timeout=10) as r:
            body = r.read()
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            body = r.read()
    try:
        return json.loads(body)
    except ValueError:
        return body


def _wait_done(port, job_id, timeout=15):
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = _req(port, f"/status/{job_id}")
        if st["state"] in ("done", "error"):
            return st
        time.sleep(0.05)
    raise TimeoutError(job_id)


@pytest.fixture
def server(tmp_path):
    pipe = FakePipeline(delay=0.3)
    srv = GenerationServer(pipe, out_dir=str(tmp_path), batch_window_s=0.2,
                           max_batch=4)
    http = srv.start(host="127.0.0.1", port=0)
    port = http.server_address[1]
    yield srv, pipe, port
    srv.stop()


def test_submit_status_result(server):
    srv, pipe, port = server
    r = _req(port, "/generate", {"prompt": "a cat", "time_length": 5})
    st = _wait_done(port, r["job_id"])
    assert st["state"] == "done"
    data = _req(port, f"/result/{r['job_id']}")
    assert data.startswith(b"\x00fakevideo:a cat")
    health = _req(port, "/healthz")
    assert health["ok"]


def test_compatible_jobs_batch_together(server):
    srv, pipe, port = server
    ids = [_req(port, "/generate", {"prompt": f"p{i}"})["job_id"]
           for i in range(3)]
    for j in ids:
        _wait_done(port, j)
    # first job starts a batch; the rest arrive within the window while
    # the worker sleeps in pipeline delay or window — expect < 3 calls
    assert any(len(c) > 1 for c in pipe.calls), pipe.calls
    m = _req(port, "/metrics")
    assert m["jobs_done"] == 3


def test_seeded_jobs_never_batch(server):
    srv, pipe, port = server
    ids = [_req(port, "/generate", {"prompt": f"s{i}", "seed": 1})["job_id"]
           for i in range(3)]
    for j in ids:
        _wait_done(port, j)
    # seeded reproducibility: every seeded job denoises alone
    assert all(len(c) == 1 for c in pipe.calls), pipe.calls


def test_mismatched_shapes_do_not_batch(server):
    srv, pipe, port = server
    a = _req(port, "/generate", {"prompt": "a", "width": 768,
                                 "height": 512})["job_id"]
    b = _req(port, "/generate", {"prompt": "b", "width": 512,
                                 "height": 768})["job_id"]
    _wait_done(port, a)
    _wait_done(port, b)
    assert all(len(c) == 1 for c in pipe.calls), pipe.calls


def test_error_isolated_and_reported(server):
    srv, pipe, port = server
    pipe.fail_on = {"boom"}
    bad = _req(port, "/generate", {"prompt": "boom"})["job_id"]
    st = _wait_done(port, bad)
    assert st["state"] == "error" and "bad prompt" in st["error"]
    # server still serves subsequent jobs
    ok = _req(port, "/generate", {"prompt": "fine"})["job_id"]
    assert _wait_done(port, ok)["state"] == "done"
