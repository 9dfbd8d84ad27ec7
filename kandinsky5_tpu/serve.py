"""Minimal production serving daemon for text-to-video generation.

The reference's only serving surface is ComfyUI (comfyui/ nodes); this
module adds a dependency-free HTTP daemon suited to one TPU host of a
fleet:

  * one device-owning worker thread — JAX is single-controller, so all
    generation runs on one thread while HTTP threads only enqueue;
  * adaptive micro-batching: requests that arrive within
    ``batch_window_s`` (and agree on shape/steps/settings) denoise as
    ONE batched call — the multi-prompt batching extension of
    pipeline.py makes a batch cost ~one CFG-batch forward per step
    rather than N;
  * per-job directories with atomic result publish, crash isolation
    per job, and a preemption-safe option (``checkpoint_dir``) that
    threads pipeline ``checkpoint_path`` so a killed host resumes
    mid-denoise on restart;
  * stdlib only (http.server + threading) — no ASGI dependency to
    vendor on a hermetic TPU image.

API:
  POST /generate {"prompt": str, "time_length": int, "width": int,
                  "height": int, "seed": int?, "num_steps": int?}
      -> {"job_id": str}
  GET  /status/<job_id>   -> {"state": queued|running|done|error, ...}
  GET  /result/<job_id>   -> video/mp4 bytes (404 until done)
  GET  /healthz           -> {"ok": true, "devices": N}
  GET  /metrics           -> {"jobs_done": N, "jobs_failed": N, ...}
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


@dataclass
class Job:
    job_id: str
    prompt: str
    time_length: int = 5
    width: int = 768
    height: int = 512
    seed: Optional[int] = None
    num_steps: Optional[int] = None
    state: str = "queued"
    error: str = ""
    result_path: str = ""
    enqueued_at: float = field(default_factory=time.time)
    started_at: float = 0.0
    finished_at: float = 0.0

    def public(self) -> dict:
        d = {"job_id": self.job_id, "state": self.state,
             "queued_s": round((self.started_at or time.time())
                               - self.enqueued_at, 3)}
        if self.state == "done":
            d["generation_s"] = round(self.finished_at - self.started_at, 3)
        if self.error:
            d["error"] = self.error
        return d

    def batch_key(self):
        """Jobs sharing this key can denoise as one batch. Explicitly
        seeded jobs never batch: the batched noise draw is slot-
        dependent, which would silently break seeded reproducibility."""
        if self.seed is not None:
            return ("seeded", self.job_id)
        return (self.time_length, self.width, self.height, self.num_steps)

    def request_key(self) -> str:
        """Deterministic identity of the REQUEST (not the submission):
        keys the resumable-denoise state file so a re-submitted job
        after a host restart finds its half-finished state."""
        import hashlib

        payload = (self.prompt, self.time_length, self.width, self.height,
                   self.seed, self.num_steps)
        return hashlib.sha1(repr(payload).encode()).hexdigest()[:16]


class GenerationServer:
    """Owns the pipeline, the job queue and the worker thread."""

    def __init__(self, pipeline, out_dir: str = "./serve_out",
                 batch_window_s: float = 0.25, max_batch: int = 4,
                 checkpoint_dir: Optional[str] = None):
        self.pipeline = pipeline
        self.out_dir = out_dir
        self.batch_window_s = batch_window_s
        self.max_batch = max_batch
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(out_dir, exist_ok=True)
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
        self.jobs: dict[str, Job] = {}
        self.q: "queue.Queue[Job]" = queue.Queue()
        self.metrics = {"jobs_done": 0, "jobs_failed": 0, "batches": 0,
                        "batched_jobs": 0}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)

    # ------------------------------------------------------------------
    def submit(self, payload: dict) -> Job:
        job = Job(
            job_id=uuid.uuid4().hex[:12],
            prompt=str(payload["prompt"]),
            time_length=int(payload.get("time_length", 5)),
            width=int(payload.get("width", 768)),
            height=int(payload.get("height", 512)),
            seed=(int(payload["seed"]) if "seed" in payload else None),
            num_steps=(int(payload["num_steps"])
                       if "num_steps" in payload else None),
        )
        with self._lock:
            self.jobs[job.job_id] = job
        self.q.put(job)
        return job

    def _take_batch(self) -> list:
        """One job, plus compatible jobs arriving within the window."""
        job = self.q.get()
        batch = [job]
        deadline = time.time() + self.batch_window_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                nxt = self.q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt.batch_key() == job.batch_key():
                batch.append(nxt)
            else:
                self.q.put(nxt)  # different shape: next batch
                break
        return batch

    def _run(self):
        while not self._stop.is_set():
            try:
                batch = self._take_batch()
            except Exception:  # noqa: BLE001
                continue
            for j in batch:
                j.state = "running"
                j.started_at = time.time()
            try:
                paths = [os.path.join(self.out_dir, f"{j.job_id}.mp4")
                         for j in batch]
                lead = batch[0]
                ckpt = (os.path.join(self.checkpoint_dir,
                                     f"{lead.request_key()}.npz")
                        if self.checkpoint_dir and len(batch) == 1 else None)
                self.pipeline(
                    [j.prompt for j in batch],
                    time_length=lead.time_length,
                    width=lead.width, height=lead.height,
                    seed=lead.seed, num_steps=lead.num_steps,
                    save_path=paths, progress=False,
                    **({"checkpoint_path": ckpt} if ckpt else {}),
                )
                for j, p in zip(batch, paths):
                    j.result_path = p
                    j.state = "done"
                    j.finished_at = time.time()
                with self._lock:
                    self.metrics["jobs_done"] += len(batch)
                    self.metrics["batches"] += 1
                    if len(batch) > 1:
                        self.metrics["batched_jobs"] += len(batch)
                self._evict_old_jobs()
            except Exception as e:  # noqa: BLE001  one bad job != dead server
                for j in batch:
                    j.state = "error"
                    j.error = f"{type(e).__name__}: {e}"[:500]
                    j.finished_at = time.time()
                with self._lock:
                    self.metrics["jobs_failed"] += len(batch)

    MAX_TERMINAL_JOBS = 1000

    def _evict_old_jobs(self):
        """Bound memory in a long-lived daemon: keep only the newest
        terminal (done/error) job records."""
        with self._lock:
            done = [j for j in self.jobs.values()
                    if j.state in ("done", "error")]
            if len(done) <= self.MAX_TERMINAL_JOBS:
                return
            done.sort(key=lambda j: j.finished_at)
            for j in done[:-self.MAX_TERMINAL_JOBS]:
                self.jobs.pop(j.job_id, None)
                # the record bound alone leaks mp4s in a long-lived
                # daemon: evict the result file with its record
                if j.result_path:
                    try:
                        os.remove(j.result_path)
                    except OSError:
                        pass

    # ------------------------------------------------------------------
    def start(self, host: str = "0.0.0.0", port: int = 8700):
        self._worker.start()
        server = ThreadingHTTPServer((host, port), self._make_handler())
        self._http = server
        self._http_thread = threading.Thread(target=server.serve_forever,
                                             daemon=True)
        self._http_thread.start()
        return server

    def stop(self):
        self._stop.set()
        if hasattr(self, "_http"):
            self._http.shutdown()

    def _make_handler(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/generate":
                    return self._json(404, {"error": "unknown endpoint"})
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    if "prompt" not in payload:
                        return self._json(400, {"error": "prompt required"})
                    job = outer.submit(payload)
                    return self._json(200, {"job_id": job.job_id})
                except Exception as e:  # noqa: BLE001
                    return self._json(400, {"error": str(e)[:200]})

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    return self._json(200, {"ok": True,
                                            "devices": len(jax.devices())})
                if self.path == "/metrics":
                    with outer._lock:
                        m = dict(outer.metrics)
                    m["queued"] = outer.q.qsize()
                    return self._json(200, m)
                if self.path.startswith("/status/"):
                    job = outer.jobs.get(self.path.split("/", 2)[2])
                    if job is None:
                        return self._json(404, {"error": "unknown job"})
                    return self._json(200, job.public())
                if self.path.startswith("/result/"):
                    job = outer.jobs.get(self.path.split("/", 2)[2])
                    if job is None or job.state != "done":
                        return self._json(404, {"error": "not ready"})
                    try:
                        with open(job.result_path, "rb") as f:
                            data = f.read()
                    except OSError:
                        # eviction may have deleted the file between the
                        # unlocked record fetch and this read
                        return self._json(404, {"error": "result evicted"})
                    self.send_response(200)
                    self.send_header("Content-Type", "video/mp4")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return None
                return self._json(404, {"error": "unknown endpoint"})

        return Handler


def main():
    import argparse

    from kandinsky5_tpu import get_T2V_pipeline

    ap = argparse.ArgumentParser(description="Kandinsky-5 TPU serving daemon")
    ap.add_argument("--config", required=True)
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--tp", type=int, default=None)
    ap.add_argument("--magcache", action="store_true")
    ap.add_argument("--offload", action="store_true")
    ap.add_argument("--out-dir", default="./serve_out")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="enable preemption-safe resumable denoise")
    ap.add_argument("--max-batch", type=int, default=4)
    args = ap.parse_args()

    pipe = get_T2V_pipeline(conf_path=args.config, tp=args.tp,
                            magcache=args.magcache, offload=args.offload)
    srv = GenerationServer(pipe, out_dir=args.out_dir,
                           max_batch=args.max_batch,
                           checkpoint_dir=args.checkpoint_dir)
    srv.start(port=args.port)
    print(f"serving on :{args.port}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
