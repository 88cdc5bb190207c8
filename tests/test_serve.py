"""Serving runtime test: real HTTP server, stubbed pipeline execution."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _reset_shutdown_latch():
    """graceful_shutdown sets the module-global _SHUTTING_DOWN event; a
    latched value would flip later tests' cancel journaling from 'canceled'
    to 'interrupted' (serve() clears it too, but most tests drive worker/
    Handler directly)."""
    from scripts import serve

    serve._SHUTTING_DOWN.clear()
    yield
    serve._SHUTTING_DOWN.clear()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_job_api_roundtrip(monkeypatch, tmp_path):
    from scripts import serve, vid2vid as v2v

    def fake_vid2vid(config=None, pipeline=None, progress=None, **kw):
        if progress is not None:
            progress({"windows": 1, "frames_written": 2})
        time.sleep(0.1)
        return {"frames_written": 4, "seed": config.seed, "output": "x.mp4", "windows": 1}

    class FakePipeline:
        def __init__(self, cfg):
            pass

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    threading.Thread(target=serve.worker, daemon=True).start()

    base = f"http://127.0.0.1:{port}"
    code, health = _get(f"{base}/healthz")
    assert code == 200 and health["ok"]

    code, resp = _post(f"{base}/jobs", {"config": {"seed": 5, "prompt": "hi"}})
    assert code == 202
    job_id = resp["job_id"]

    deadline = time.time() + 10
    status = None
    while time.time() < deadline:
        code, status = _get(f"{base}/jobs/{job_id}")
        if status["status"] in ("done", "failed"):
            break
        time.sleep(0.1)
    assert status["status"] == "done", status
    assert status["result"]["frames_written"] == 4
    # live per-window progress surfaced while the job ran
    assert status["progress"] == {"windows": 1, "frames_written": 2}

    code, err = _get(f"{base}/jobs/nope")
    assert code == 404

    code, err = _post(f"{base}/jobs", {"bad": 1})
    assert code == 400
    serve.JOB_QUEUE.put(None)  # retire this test's worker
    httpd.shutdown()


def _delete(url):
    req = urllib.request.Request(url, method="DELETE")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_job_list_and_cancellation(monkeypatch):
    """DELETE /jobs/<id> cancels a queued job (the worker skips it); a
    running job returns 409; GET /jobs lists everything."""
    from scripts import serve

    gate = threading.Event()

    def fake_vid2vid(config=None, pipeline=None, progress=None, **kw):
        gate.wait(timeout=10)
        return {"frames_written": 1, "seed": 0, "output": "", "windows": 1}

    class FakePipeline:
        def __init__(self, cfg):
            pass

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    threading.Thread(target=serve.worker, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    _, r1 = _post(f"{base}/jobs", {"config": {"prompt": "a"}})
    j1 = r1["job_id"]
    deadline = time.time() + 10
    while time.time() < deadline:
        _, s = _get(f"{base}/jobs/{j1}")
        if s["status"] == "running":
            break
        time.sleep(0.05)
    assert s["status"] == "running"

    _, r2 = _post(f"{base}/jobs", {"config": {"prompt": "b"}})
    j2 = r2["job_id"]

    code, resp = _delete(f"{base}/jobs/{j2}")
    assert code == 200 and resp["status"] == "canceled"
    code, resp = _delete(f"{base}/jobs/{j1}")
    # running: cooperative request (honored at a window boundary; this fake
    # vid2vid ignores should_stop, so the job still completes as done)
    assert code == 202 and resp["status"] == "cancel_requested"
    code, resp = _delete(f"{base}/jobs/nope")
    assert code == 404

    code, listing = _get(f"{base}/jobs")
    statuses = {j["id"]: j["status"] for j in listing["jobs"]}
    assert statuses[j1] == "running" and statuses[j2] == "canceled"

    gate.set()
    deadline = time.time() + 10
    while time.time() < deadline:
        _, s1 = _get(f"{base}/jobs/{j1}")
        if s1["status"] in ("done", "failed"):
            break
        time.sleep(0.05)
    assert s1["status"] == "done"
    # the canceled job was skipped, not executed
    _, s2 = _get(f"{base}/jobs/{j2}")
    assert s2["status"] == "canceled" and "result" not in s2
    # terminal job: cancel is a 409
    code, resp = _delete(f"{base}/jobs/{j1}")
    assert code == 409
    serve.JOB_QUEUE.put(None)
    httpd.shutdown()


def test_running_job_cooperative_cancel(monkeypatch):
    """DELETE on a RUNNING job requests cooperative cancellation: vid2vid
    sees should_stop() at the next window boundary, returns a canceled
    partial summary, and the job ends 'canceled' with that result."""
    from scripts import serve

    started = threading.Event()

    def fake_vid2vid(config=None, pipeline=None, progress=None,
                     should_stop=None, **kw):
        started.set()
        deadline = time.time() + 10
        windows = 0
        while time.time() < deadline:
            if should_stop is not None and should_stop():
                return {"frames_written": windows, "windows": windows,
                        "seed": 0, "output": "", "canceled": True}
            windows += 1
            if progress is not None:
                progress({"windows": windows})
            time.sleep(0.02)
        return {"frames_written": windows, "windows": windows, "seed": 0,
                "output": "", "canceled": False}

    class FakePipeline:
        def __init__(self, cfg):
            pass

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)
    serve._PIPE_CACHE.clear()

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    threading.Thread(target=serve.worker, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    _, r = _post(f"{base}/jobs", {"config": {"prompt": "long"}})
    jid = r["job_id"]
    assert started.wait(timeout=10)

    code, resp = _delete(f"{base}/jobs/{jid}")
    assert code == 202 and resp["status"] == "cancel_requested"

    deadline = time.time() + 10
    s = None
    while time.time() < deadline:
        _, s = _get(f"{base}/jobs/{jid}")
        if s["status"] in ("done", "failed", "canceled"):
            break
        time.sleep(0.05)
    assert s["status"] == "canceled", s
    # the partial summary is preserved
    assert s["result"]["canceled"] is True
    serve.JOB_QUEUE.put(None)
    httpd.shutdown()


def test_pipeline_cache_lru(monkeypatch):
    """The pipeline cache is a bounded LRU: each entry pins a full param
    stack in device HBM, so distinct model stacks must evict oldest-first
    and repeat jobs must reuse (no rebuild)."""
    from scripts import serve

    built = []

    def fake_vid2vid(config=None, pipeline=None, progress=None, **kw):
        return {"frames_written": 1, "seed": 0, "output": "", "windows": 1}

    class FakePipeline:
        def __init__(self, cfg):
            built.append(cfg.pretrained_model_path)

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)
    monkeypatch.setattr(serve, "PIPE_CACHE_MAX", 2)
    serve._PIPE_CACHE.clear()

    worker = threading.Thread(target=serve.worker, daemon=True)
    worker.start()

    def run_job(model):
        jid = f"j-{model}-{len(built)}-{time.time_ns()}"
        with serve._LOCK:
            serve.JOBS[jid] = {
                "status": "queued",
                "config": {"prompt": "x", "pretrained_model_path": model},
            }
        serve.JOB_QUEUE.put(jid)
        deadline = time.time() + 10
        while time.time() < deadline:
            with serve._LOCK:
                st = serve.JOBS[jid]["status"]
            if st in ("done", "failed"):
                return st
            time.sleep(0.02)
        return "timeout"

    assert run_job("A") == "done" and run_job("B") == "done"
    assert built == ["A", "B"] and len(serve._PIPE_CACHE) == 2
    # C evicts A (oldest)
    assert run_job("C") == "done"
    assert built == ["A", "B", "C"] and len(serve._PIPE_CACHE) == 2
    # B is cached (no rebuild) and becomes most-recent
    assert run_job("B") == "done"
    assert built == ["A", "B", "C"]
    # A was evicted: rebuilt, and evicts C (B was touched more recently)
    assert run_job("A") == "done"
    assert built == ["A", "B", "C", "A"]
    cached_models = [k[0] for k in serve._PIPE_CACHE]
    assert cached_models == ["B", "A"]
    serve.JOB_QUEUE.put(None)
    worker.join(timeout=5)


def test_metrics_endpoint(monkeypatch):
    """GET /metrics: Prometheus text exposition with job-status gauges and
    the frames-written counter (pulled from results/progress)."""
    import urllib.request

    from scripts import serve

    def fake_vid2vid(config=None, pipeline=None, progress=None, **kw):
        return {"frames_written": 7, "seed": 0, "output": "", "windows": 2}

    class FakePipeline:
        def __init__(self, cfg):
            pass

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)
    serve._PIPE_CACHE.clear()

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    threading.Thread(target=serve.worker, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    _, r = _post(f"{base}/jobs", {"config": {"prompt": "m"}})
    jid = r["job_id"]
    deadline = time.time() + 10
    while time.time() < deadline:
        _, s = _get(f"{base}/jobs/{jid}")
        if s["status"] == "done":
            break
        time.sleep(0.05)

    with urllib.request.urlopen(f"{base}/metrics") as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert 'controlanimate_jobs{status="done"} ' in text
    assert "controlanimate_pipelines_cached 1" in text
    # counts this job's 7 frames (plus any left by earlier tests sharing
    # the module-global JOBS)
    total = [l for l in text.splitlines()
             if l.startswith("controlanimate_frames_written_total")]
    assert total and int(total[0].split()[-1]) >= 7
    serve.JOB_QUEUE.put(None)
    httpd.shutdown()


def test_graceful_shutdown(monkeypatch, tmp_path):
    """SIGTERM path (graceful_shutdown): queued jobs cancel without pipeline
    builds, the running job stops cooperatively at its window boundary with
    the partial summary, the worker retires, and the server stops. With a
    journal, the stopped job records 'interrupted' (re-queued on restart)
    while the queued job keeps its 'queued' journal state."""
    from scripts import serve

    started = threading.Event()
    built = []

    def fake_vid2vid(config=None, pipeline=None, progress=None,
                     should_stop=None, **kw):
        started.set()
        deadline = time.time() + 10
        while time.time() < deadline:
            if should_stop is not None and should_stop():
                return {"frames_written": 3, "windows": 1, "seed": 0,
                        "output": "", "canceled": True}
            time.sleep(0.02)
        return {"frames_written": 9, "windows": 3, "seed": 0, "output": "",
                "canceled": False}

    class FakePipeline:
        def __init__(self, cfg):
            built.append(cfg.pretrained_model_path)

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)
    monkeypatch.setattr(serve, "JOURNAL_PATH", tmp_path / "jobs.jsonl")
    serve._PIPE_CACHE.clear()

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    worker_thread = threading.Thread(target=serve.worker, daemon=True)
    worker_thread.start()
    base = f"http://127.0.0.1:{port}"

    _, r1 = _post(f"{base}/jobs", {"config": {"prompt": "running",
                                              "pretrained_model_path": "R"}})
    assert started.wait(timeout=10)
    _, r2 = _post(f"{base}/jobs", {"config": {"prompt": "queued",
                                              "pretrained_model_path": "Q"}})

    serve.graceful_shutdown(httpd, worker_thread, timeout=15)
    assert not worker_thread.is_alive()

    with serve._LOCK:
        s_run = serve.JOBS[r1["job_id"]]
        s_q = serve.JOBS[r2["job_id"]]
    assert s_run["status"] == "canceled"
    assert s_run["result"]["canceled"] is True  # window-boundary stop
    assert s_q["status"] == "canceled" and "result" not in s_q
    assert built == ["R"]  # the queued job never built a pipeline
    # journal: shutdown stop != user cancel — the running job records
    # 'interrupted' and the queued one stays 'queued', so BOTH re-queue on
    # the next start
    states = serve.load_journal(tmp_path / "jobs.jsonl")
    assert states[r1["job_id"]]["status"] == "interrupted"
    assert states[r2["job_id"]]["status"] == "queued"


def test_user_cancel_stays_terminal_during_shutdown(monkeypatch, tmp_path):
    """A user-DELETEd running job must journal 'canceled' (terminal) even
    when SIGTERM lands in the same window — only shutdown-stopped jobs
    become 'interrupted' (re-queued on restart)."""
    import queue as _queue

    from scripts import serve

    def fake_vid2vid(config=None, pipeline=None, progress=None,
                     should_stop=None, **kw):
        assert should_stop()  # the pre-set cancel event
        return {"frames_written": 0, "windows": 0, "seed": 0, "output": "",
                "canceled": True}

    class FakePipeline:
        def __init__(self, cfg):
            pass

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)
    journal = tmp_path / "jobs.jsonl"
    monkeypatch.setattr(serve, "JOURNAL_PATH", journal)
    monkeypatch.setattr(serve, "JOBS", {})
    monkeypatch.setattr(serve, "_CANCEL_EVENTS", {})
    monkeypatch.setattr(serve, "JOB_QUEUE", _queue.Queue())
    serve._PIPE_CACHE.clear()

    jid = "cancelrace"
    with serve._LOCK:
        serve.JOBS[jid] = {
            "status": "queued", "config": {"prompt": "x"},
            "cancel_requested": True,  # the DELETE landed
        }
        ev = threading.Event()
        ev.set()
        serve._CANCEL_EVENTS[jid] = ev
        serve._journal({"op": "submit", "id": jid, "config": {"prompt": "x"}})
    serve._SHUTTING_DOWN.set()  # ...and SIGTERM in the same window
    serve.JOB_QUEUE.put(jid)
    serve.JOB_QUEUE.put(None)
    serve.worker()

    assert serve.JOBS[jid]["status"] == "canceled"
    assert serve.load_journal(journal)[jid]["status"] == "canceled"


def test_journal_replay_after_crash(monkeypatch, tmp_path):
    """Crash-safe restart: the journal re-queues queued/running/interrupted
    jobs (mid-run jobs get resume=1 when their checkpoint exists), keeps
    terminal jobs for listing, and tolerates a torn tail line."""
    import json as _json

    from scripts import serve

    out_dir = tmp_path / "job_a_out"
    out_dir.mkdir()
    (out_dir / "stitch_state.npz").write_bytes(b"x")  # checkpoint exists

    journal = tmp_path / "jobs.jsonl"
    lines = [
        {"op": "submit", "id": "aaa", "config": {
            "prompt": "a", "output_video_dir": str(out_dir)}},
        {"op": "status", "id": "aaa", "status": "running"},
        {"op": "submit", "id": "bbb", "config": {"prompt": "b"}},
        {"op": "submit", "id": "ccc", "config": {"prompt": "c"}},
        {"op": "status", "id": "ccc", "status": "running"},
        {"op": "status", "id": "ccc", "status": "done"},
        {"op": "submit", "id": "ddd", "config": {"prompt": "d"}},
        {"op": "status", "id": "ddd", "status": "running"},
        {"op": "status", "id": "ddd", "status": "interrupted"},
        # explicit parallel_segments=1 is SEQUENTIAL (vid2vid gates on >1):
        # must still resume from its checkpoint
        {"op": "submit", "id": "eee", "config": {
            "prompt": "e", "parallel_segments": 1,
            "output_video_dir": str(out_dir)}},
        {"op": "status", "id": "eee", "status": "running"},
        {"op": "status", "id": "fff"},  # well-formed JSON, wrong schema
    ]
    with open(journal, "w") as f:
        for rec in lines:
            f.write(_json.dumps(rec) + "\n")
        f.write('{"op": "subm')  # torn tail write (crash mid-append)

    monkeypatch.setattr(serve, "JOBS", {})
    monkeypatch.setattr(serve, "_CANCEL_EVENTS", {})
    monkeypatch.setattr(serve, "JOB_QUEUE", __import__("queue").Queue())
    monkeypatch.setattr(serve, "JOURNAL_PATH", journal)

    requeued = serve.replay_journal(journal)
    # aaa was mid-run with a checkpoint -> re-queued with resume
    # bbb was queued -> re-queued as-is
    # ccc finished -> restored for listing only
    # ddd was SIGTERM-interrupted (no checkpoint) -> re-queued fresh
    assert sorted(requeued) == ["aaa", "bbb", "ddd", "eee"]
    assert serve.JOBS["aaa"]["config"].get("resume") == 1
    assert "resume" not in serve.JOBS["bbb"]["config"]
    assert "resume" not in serve.JOBS["ddd"]["config"]
    assert serve.JOBS["eee"]["config"].get("resume") == 1
    assert serve.JOBS["ccc"]["status"] == "done"
    ids = set()
    while not serve.JOB_QUEUE.empty():
        ids.add(serve.JOB_QUEUE.get())
    assert ids == {"aaa", "bbb", "ddd", "eee"}
    # the requeue is NOT journaled (folding to 'queued' would erase the
    # running/interrupted evidence), so a second replay re-attaches resume
    assert sorted(serve.replay_journal(journal)) == ["aaa", "bbb", "ddd", "eee"]
    assert serve.JOBS["aaa"]["config"].get("resume") == 1
    # the torn tail was repaired in place: the journal now ends with a
    # newline and a fresh append parses cleanly
    with serve._LOCK:
        serve._journal({"op": "status", "id": "ccc", "status": "done"})
    assert serve.load_journal(journal)["ccc"]["status"] == "done"


def test_journal_records_lifecycle(monkeypatch, tmp_path):
    """POST/worker/DELETE transitions append to the journal."""
    from scripts import serve

    journal = tmp_path / "jobs.jsonl"
    monkeypatch.setattr(serve, "JOURNAL_PATH", journal)

    def fake_vid2vid(config=None, pipeline=None, progress=None, **kw):
        return {"frames_written": 1, "seed": 0, "output": "", "windows": 1}

    class FakePipeline:
        def __init__(self, cfg):
            pass

    monkeypatch.setattr("scripts.vid2vid.vid2vid", fake_vid2vid)
    import controlanimate_tpu.pipelines.facade as facade

    monkeypatch.setattr(facade, "ControlAnimatePipeline", FakePipeline)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    threading.Thread(target=serve.worker, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    _, r = _post(f"{base}/jobs", {"config": {"prompt": "j"}})
    jid = r["job_id"]
    deadline = time.time() + 10
    while time.time() < deadline:
        _, s = _get(f"{base}/jobs/{jid}")
        if s["status"] == "done":
            break
        time.sleep(0.05)
    assert s["status"] == "done"

    states = serve.load_journal(journal)
    assert states[jid]["status"] == "done"
    assert states[jid]["config"] == {"prompt": "j"}
    serve.JOB_QUEUE.put(None)
    httpd.shutdown()


def test_bearer_token_auth():
    """When a token is configured, unauthenticated requests get 401 and
    Bearer-authenticated ones pass (serve.py binds loopback by default and
    requires --token beyond loopback)."""
    from http.server import ThreadingHTTPServer

    from scripts import serve

    class AuthHandler(serve.Handler):
        auth_token = "s3cret"

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), AuthHandler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    code, resp = _get(f"{base}/healthz")
    assert code == 401

    req = urllib.request.Request(
        f"{base}/healthz", headers={"Authorization": "Bearer s3cret"}
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    httpd.shutdown()
