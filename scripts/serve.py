"""Minimal production-serving runtime: an HTTP job API over the vid2vid
pipeline (stdlib-only; no reference equivalent — the reference is a one-shot
CLI, main.py:16-23).

  POST   /jobs       {"config": {...RunConfig keys...}}   -> {"job_id": ...}
  GET    /jobs       -> {"jobs": [{"id": ..., "status": ...}, ...]}
  GET    /jobs/<id>  -> {"status": "queued|running|done|failed|canceled",
                         "progress": {"windows": n, "frames_written": m}, ...}
                        (parallel_segments>1 jobs report {"windows",
                         "segments", "frames_generated"} instead —
                         lockstep segments have no per-sink write order)
  DELETE /jobs/<id>  -> queued: canceled immediately (200). running: requests
                        cooperative cancellation (202) — the worker stops at
                        the next window boundary (a window program in flight
                        on the chip cannot be revoked), flushes pending emits
                        and, when the job's checkpoint_interval > 0 (the
                        default), saves a resumable checkpoint; with
                        checkpointing disabled the tail overlap is emitted
                        instead (complete output up to the stop point, not
                        resumable). The job ends "canceled" with the partial
                        summary in `result`. done/failed/canceled: 409.
  GET    /healthz    -> ok
  GET    /metrics    -> Prometheus text: jobs by status, pipeline-cache
                        occupancy, frames written

One worker thread executes jobs sequentially (a single-chip TPU serves one
window program at a time; scale-out is one process per chip/slice). Model
stacks are cached across jobs keyed by their model-path signature, so repeat
jobs skip weight ingestion and jit compilation; the cache is a bounded LRU
(CONTROLANIMATE_SERVE_PIPELINES, default 2) because each entry pins a full
param stack in device HBM.

--journal <path> adds crash-safe job persistence: a JSONL of submissions and
status transitions, replayed on start — queued jobs re-queue, mid-run jobs
resume from their epoch checkpoints, SIGTERM-interrupted jobs likewise.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import traceback
import uuid
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from controlanimate_tpu.config import RunConfig

JOBS: dict[str, dict] = {}
# cooperative-cancel events live OUTSIDE the job dicts (those are JSON-
# serialized by GET handlers)
_CANCEL_EVENTS: dict[str, threading.Event] = {}
JOB_QUEUE: "queue.Queue[str]" = queue.Queue()
# LRU: each cached pipeline pins a full model stack's params in device HBM
# (~2-3 GB bf16 for the SD1.5 stack on a 16 GB v5e), so the cache must be
# bounded — evicting drops the last reference and JAX frees the buffers
_PIPE_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
PIPE_CACHE_MAX = int(os.environ.get("CONTROLANIMATE_SERVE_PIPELINES", "2"))
_LOCK = threading.Lock()
# optional crash-safe job journal (--journal): submissions and status
# transitions append JSON lines; on restart, replay_journal() re-queues
# interrupted jobs (resuming from their epoch checkpoints when present)
JOURNAL_PATH: Path | None = None
# distinguishes a user cancel (terminal) from a shutdown stop (re-queue on
# restart) when the worker records the outcome
_SHUTTING_DOWN = threading.Event()


def _journal(rec: dict) -> None:
    """Append one JSON line. Callers hold _LOCK, keeping the line order
    consistent with the in-memory transition it records."""
    if JOURNAL_PATH is None:
        return
    with open(JOURNAL_PATH, "a") as f:
        f.write(json.dumps(rec) + "\n")


def load_journal(path) -> dict[str, dict]:
    """Fold the journal into the last-known state per job. Malformed lines —
    a torn tail from a crash mid-append, hand edits, records from another
    schema version — are skipped, never fatal: the journal exists for crash
    recovery, so reading it must not be able to crash the server."""
    jobs: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
                if rec.get("op") == "submit":
                    jobs[rec["id"]] = {
                        "status": "queued", "config": rec["config"],
                    }
                elif rec.get("op") == "status" and rec.get("id") in jobs:
                    jobs[rec["id"]]["status"] = rec["status"]
            except (ValueError, KeyError, TypeError):
                continue
    return jobs


def replay_journal(path) -> list[str]:
    """Rebuild JOBS from a journal after a crash/restart: terminal jobs are
    restored for listing; queued/running ones are re-queued — a job that was
    mid-run resumes from its epoch checkpoint when one exists (sequential
    mode writes stitch_state.npz; vid2vid re-reads the input and restarts at
    the first unemitted window)."""
    from scripts.vid2vid import STATE_FILE

    # repair a torn tail first: a crash mid-append can leave a partial line
    # with no newline, and the NEXT append would glue onto it — losing that
    # record too
    with open(path, "rb+") as f:
        f.seek(0, 2)
        if f.tell() > 0:
            f.seek(-1, 2)
            if f.read(1) != b"\n":
                f.write(b"\n")

    requeued = []
    for jid, job in load_journal(path).items():
        status = job["status"]
        if status in ("queued", "running", "interrupted"):
            cfg = dict(job["config"])
            # sequential mode is cfg.parallel_segments <= 1 (vid2vid gates
            # on > 1); resume applies only there and only when a checkpoint
            # actually exists
            try:
                sequential = int(cfg.get("parallel_segments") or 0) <= 1
                out_dir = RunConfig.from_dict(cfg).output_video_dir
            except Exception:
                # unparseable config: requeue raw — the worker will record
                # the failure with a traceback where the user can see it
                sequential, out_dir = False, ""
            if (
                status in ("running", "interrupted") and sequential
                and (Path(out_dir) / STATE_FILE).exists()
            ):
                cfg["resume"] = 1
            with _LOCK:
                JOBS[jid] = {"status": "queued", "config": cfg}
                _CANCEL_EVENTS[jid] = threading.Event()
                # deliberately NOT journaled: folding the requeue to
                # "queued" would erase the running/interrupted evidence a
                # SECOND restart needs to re-attach resume
            JOB_QUEUE.put(jid)
            requeued.append(jid)
        else:
            with _LOCK:
                JOBS[jid] = job
    return requeued


def _pipeline_key(cfg: RunConfig) -> tuple:
    return (
        cfg.pretrained_model_path, cfg.pretrained_lcm_model_path, cfg.use_lcm,
        cfg.vae_path, cfg.dreambooth_path, tuple(cfg.lora_model_paths),
        cfg.motion_module, tuple(cfg.controlnets), cfg.use_ipadapter,
    )


def worker() -> None:
    from scripts.vid2vid import vid2vid

    while True:
        job_id = JOB_QUEUE.get()
        if job_id is None:  # shutdown sentinel (graceful stop / tests)
            return
        job = JOBS[job_id]
        with _LOCK:
            if job["status"] == "canceled":
                _CANCEL_EVENTS.pop(job_id, None)
                continue
            job["status"] = "running"
            _journal({"op": "status", "id": job_id, "status": "running"})
        try:
            cfg = RunConfig.from_dict(job["config"])
            key = _pipeline_key(cfg)
            # only this worker thread touches the cache — no lock needed
            pipeline = _PIPE_CACHE.get(key)
            if pipeline is None:
                from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline

                # evict BEFORE building: otherwise peak HBM transiently holds
                # MAX+1 param stacks — the very overflow the bound prevents
                while len(_PIPE_CACHE) >= max(1, PIPE_CACHE_MAX):
                    _PIPE_CACHE.popitem(last=False)
                pipeline = ControlAnimatePipeline(cfg)
                _PIPE_CACHE[key] = pipeline
            else:
                _PIPE_CACHE.move_to_end(key)
            def _progress(p, j=job):
                # live progress: GET /jobs/<id> shows windows/frames so far.
                # Mutations happen under _LOCK so handler threads can snapshot
                # the job dict without hitting size-changed-during-iteration.
                with _LOCK:
                    j.setdefault("progress", {}).update(p)

            cancel_ev = _CANCEL_EVENTS.get(job_id)
            summary = vid2vid(
                config=cfg, pipeline=pipeline, progress=_progress,
                should_stop=cancel_ev.is_set if cancel_ev is not None else None,
            )
            with _LOCK:
                job["status"] = (
                    "canceled" if summary.get("canceled") else "done"
                )
                job["result"] = summary
                # a shutdown-stopped job is not user-canceled: journal it
                # "interrupted" so a restarted server re-queues it (resuming
                # from its checkpoint). cancel_requested distinguishes an
                # explicit DELETE from the shutdown stop — a user cancel
                # stays terminal even when SIGTERM lands during the same
                # window
                _journal({
                    "op": "status", "id": job_id,
                    "status": (
                        "interrupted"
                        if (
                            job["status"] == "canceled"
                            and _SHUTTING_DOWN.is_set()
                            and not job.get("cancel_requested")
                        )
                        else job["status"]
                    ),
                })
        except Exception as e:  # report, keep serving
            with _LOCK:
                job["status"] = "failed"
                job["error"] = f"{type(e).__name__}: {e}"
                job["traceback"] = traceback.format_exc()
                _journal({"op": "status", "id": job_id, "status": "failed"})
        finally:
            _CANCEL_EVENTS.pop(job_id, None)


class Handler(BaseHTTPRequestHandler):
    auth_token: str | None = None

    def _authorized(self) -> bool:
        if self.auth_token is None:
            return True
        return self.headers.get("Authorization", "") == f"Bearer {self.auth_token}"

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if not self._authorized():
            self._json(401, {"error": "unauthorized"})
            return
        if self.path == "/healthz":
            self._json(200, {
                "ok": True, "jobs": len(JOBS),
                "pipelines_cached": len(_PIPE_CACHE),
            })
            return
        if self.path == "/metrics":
            # Prometheus text exposition (no client library needed): job
            # counts by status, cache occupancy, frames emitted so far
            with _LOCK:
                by_status: dict[str, int] = {}
                frames = 0
                for j in JOBS.values():
                    by_status[j["status"]] = by_status.get(j["status"], 0) + 1
                    src = j.get("result") or j.get("progress") or {}
                    frames += int(src.get("frames_written", 0))
                cached = len(_PIPE_CACHE)
            lines = [
                "# TYPE controlanimate_jobs gauge",
                *(
                    f'controlanimate_jobs{{status="{s}"}} {n}'
                    for s, n in sorted(by_status.items())
                ),
                "# TYPE controlanimate_pipelines_cached gauge",
                f"controlanimate_pipelines_cached {cached}",
                "# TYPE controlanimate_frames_written_total counter",
                f"controlanimate_frames_written_total {frames}",
            ]
            body = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path == "/jobs":
            with _LOCK:  # POST/worker threads mutate JOBS concurrently
                listing = [
                    {"id": jid, "status": j["status"]} for jid, j in JOBS.items()
                ]
            self._json(200, {"jobs": listing})
            return
        if self.path.startswith("/jobs/"):
            with _LOCK:
                job = JOBS.get(self.path.split("/")[-1])
                if job is not None:
                    # deep-snapshot: `progress` is updated by the worker while
                    # we serialize, and json.dumps iterates nested dicts
                    payload = {
                        k: (dict(v) if isinstance(v, dict) else v)
                        for k, v in job.items() if k != "config"
                    }
            if job is None:
                self._json(404, {"error": "unknown job"})
                return
            self._json(200, payload)
            return
        self._json(404, {"error": "unknown path"})

    def do_DELETE(self):
        if not self._authorized():
            self._json(401, {"error": "unauthorized"})
            return
        if not self.path.startswith("/jobs/"):
            self._json(404, {"error": "unknown path"})
            return
        job_id = self.path.split("/")[-1]
        job = JOBS.get(job_id)
        if job is None:
            self._json(404, {"error": "unknown job"})
            return
        with _LOCK:
            status = job["status"]
            if status == "queued":
                job["status"] = "canceled"
                _journal({"op": "status", "id": job_id, "status": "canceled"})
                reply = (200, {"status": "canceled"})
            elif status == "running":
                ev = _CANCEL_EVENTS.get(job_id)
                if ev is not None:
                    # cooperative: honored at the next window boundary
                    ev.set()
                    job["cancel_requested"] = True
                    reply = (202, {"status": "cancel_requested"})
                else:
                    # running but never registered for cancellation (job
                    # injected without POST): claiming 202 would leave the
                    # client polling forever
                    reply = (409, {"error": "job is running and not cancelable"})
            else:
                reply = (409, {"error": f"job is {status}"})
        self._json(*reply)

    def do_POST(self):
        if not self._authorized():
            self._json(401, {"error": "unauthorized"})
            return
        if self.path != "/jobs":
            self._json(404, {"error": "unknown path"})
            return
        length = int(self.headers.get("Content-Length", 0))
        try:
            payload = json.loads(self.rfile.read(length) or b"{}")
            cfg = payload.get("config")
            if not isinstance(cfg, dict):
                raise ValueError("body must be {'config': {...}}")
            RunConfig.from_dict(cfg)  # validate early
        except Exception as e:
            self._json(400, {"error": str(e)})
            return
        job_id = uuid.uuid4().hex[:12]
        with _LOCK:
            JOBS[job_id] = {"status": "queued", "config": cfg}
            _CANCEL_EVENTS[job_id] = threading.Event()
            _journal({"op": "submit", "id": job_id, "config": cfg})
        JOB_QUEUE.put(job_id)
        self._json(202, {"job_id": job_id})

    def log_message(self, fmt, *args):  # quiet
        pass


def graceful_shutdown(httpd, worker_thread, timeout: float = 3600.0) -> None:
    """SIGTERM path: cancel every queued job, request a cooperative stop of
    the running one (it checkpoints at the next window boundary), retire the
    worker, then stop accepting requests."""
    _SHUTTING_DOWN.set()
    with _LOCK:
        for j in JOBS.values():
            if j["status"] == "queued":
                # don't let the worker build a pipeline just to cancel it.
                # Deliberately NOT journaled: the journal keeps them
                # "queued" so a restarted server re-queues them.
                j["status"] = "canceled"
        for ev in _CANCEL_EVENTS.values():
            ev.set()
    JOB_QUEUE.put(None)
    worker_thread.join(timeout)
    httpd.shutdown()


def serve(port: int = 8000, host: str = "127.0.0.1", token: str | None = None,
          journal: str | None = None):
    """Job configs control filesystem paths and consume the TPU, so the
    default bind is loopback-only; pass --host 0.0.0.0 plus --token to expose
    it (requests must then send `Authorization: Bearer <token>`).

    `journal` enables crash-safe job persistence: submissions and status
    transitions append to the JSONL file, and on start any jobs the journal
    shows as queued/running/interrupted are re-queued (mid-run jobs resume
    from their epoch checkpoints)."""
    global JOURNAL_PATH
    _SHUTTING_DOWN.clear()  # a prior in-process shutdown must not latch
    Handler.auth_token = token
    if journal:
        JOURNAL_PATH = Path(journal)
        if JOURNAL_PATH.exists():
            requeued = replay_journal(JOURNAL_PATH)
            if requeued:
                print(f"re-queued {len(requeued)} journaled job(s)", flush=True)
    worker_thread = threading.Thread(target=worker, daemon=True)
    worker_thread.start()
    httpd = ThreadingHTTPServer((host, port), Handler)

    import signal

    signal.signal(
        signal.SIGTERM,
        lambda s, f: threading.Thread(
            target=graceful_shutdown, args=(httpd, worker_thread), daemon=True
        ).start(),
    )
    print(f"serving on {host}:{port}", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("port", nargs="?", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--token", default=None, help="shared-secret bearer token")
    ap.add_argument("--journal", default=None,
                    help="JSONL job journal for crash-safe restart/resume")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu), as in main.py")
    a = ap.parse_args()
    if a.host not in ("127.0.0.1", "localhost", "::1") and not a.token:
        ap.error("--token is required when binding beyond loopback")
    if a.platform:
        import jax

        jax.config.update("jax_platforms", a.platform)
    serve(a.port, a.host, a.token, a.journal)
