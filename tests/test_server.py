"""API server tests with a faked pipeline stage (fast, no model) — the test
style SURVEY §4 prescribes. Uses aiohttp's test utilities."""

import asyncio
import json
import os

import pytest

from whisper_aries_tpu.config import AriesConfig
from whisper_aries_tpu.serve.jobstore import JobStore
from whisper_aries_tpu.serve.server import create_app

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402


def fake_pipeline(audio_file, output_dir, formats, confidence_threshold,
                  language, run_llm_analysis, **kwargs):
    # **kwargs absorbs pass-through knobs like resume_path
    os.makedirs(output_dir, exist_ok=True)
    outputs = {}
    segs = [{"text": "hello", "start": 0.0, "end": 1.0,
             "speaker": "SPEAKER_00", "confidence": 1.0}]
    for fmt in formats:
        p = os.path.join(output_dir, f"out.{fmt}")
        with open(p, "w") as f:
            f.write(json.dumps({"segments": segs}) if fmt == "json" else "x")
        outputs[fmt] = p
    return {
        "success": True,
        "outputs": outputs,
        "metadata": {"language": language or "auto"},
        "stats": {"num_segments": 1},
        "aligned_segments": segs,
    }


def failing_pipeline(**kwargs):
    return {"success": False, "error": "boom"}


import contextlib


@pytest.fixture
def make_client(tmp_path):
    """Async context manager: creates and closes the client in one loop."""

    @contextlib.asynccontextmanager
    async def _make(pipeline=fake_pipeline):
        cfg = AriesConfig()
        cfg.server.output_root = str(tmp_path / "outputs")
        cfg.server.job_store_path = str(tmp_path / "jobs.json")
        app = create_app(cfg, pipeline_fn=pipeline)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            yield client
        finally:
            await client.close()

    return _make


def run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


async def upload(client, filename="test.wav", **form):
    data = aiohttp.FormData()
    data.add_field("file", b"RIFFfake", filename=filename)
    for k, v in form.items():
        data.add_field(k, str(v))
    resp = await client.post("/analyze/", data=data)
    return resp


async def wait_done(client, job_id, timeout=5.0):
    for _ in range(int(timeout / 0.05)):
        resp = await client.get(f"/status/{job_id}")
        d = await resp.json()
        if d["status"] in ("completed", "failed"):
            return d
        await asyncio.sleep(0.05)
    raise TimeoutError


def test_root_health(make_client):
    async def go():
        async with make_client() as client:
            resp = await client.get("/")
            d = await resp.json()
            assert d["status"] == "ready"
            assert d["endpoints"]["upload"] == "/analyze/"

    run(go())


def test_upload_and_complete(make_client):
    async def go():
        async with make_client() as client:
            resp = await upload(client, language="en", formats="json,srt",
                                run_llm_analysis="false")
            assert resp.status == 200
            d = await resp.json()
            assert d["status"] == "queued"
            assert d["filename"] == "test.wav"
            job = await wait_done(client, d["job_id"])
            assert job["status"] == "completed"
            assert job["progress"] == 100
            assert set(job["result"]["outputs"]) == {"json", "srt"}

    run(go())


def test_upload_rejects_bad_extension(make_client):
    async def go():
        async with make_client() as client:
            resp = await upload(client, filename="evil.exe")
            assert resp.status == 400
            d = await resp.json()
            assert "Unsupported file type" in d["detail"]

    run(go())


def test_download_roundtrip(make_client):
    async def go():
        async with make_client() as client:
            resp = await upload(client, formats="json")
            d = await resp.json()
            job = await wait_done(client, d["job_id"])
            dl = await client.get(f"/download/{d['job_id']}/json")
            assert dl.status == 200
            body = await dl.read()
            assert b"segments" in body
            # unknown type -> 404 with available list
            dl2 = await client.get(f"/download/{d['job_id']}/html")
            assert dl2.status == 404

    run(go())


def test_status_unknown_job(make_client):
    async def go():
        async with make_client() as client:
            resp = await client.get("/status/nope")
            assert resp.status == 404

    run(go())


def test_failed_pipeline_reported(make_client):
    async def go():
        async with make_client(pipeline=failing_pipeline) as client:
            resp = await upload(client)
            d = await resp.json()
            job = await wait_done(client, d["job_id"])
            assert job["status"] == "failed"
            assert job["error"] == "boom"

    run(go())


def test_jobs_list_stats_delete(make_client):
    async def go():
        async with make_client() as client:
            r1 = await (await upload(client)).json()
            r2 = await (await upload(client)).json()
            await wait_done(client, r1["job_id"])
            await wait_done(client, r2["job_id"])
            jobs = await (await client.get("/jobs/")).json()
            assert len(jobs["jobs"]) == 2
            stats = await (await client.get("/stats/")).json()
            assert stats["total_jobs"] == 2
            assert stats["completed_jobs"] == 2
            assert stats["success_rate"] == 100
            resp = await client.delete(f"/jobs/{r1['job_id']}")
            assert resp.status == 200
            stats = await (await client.get("/stats/")).json()
            assert stats["total_jobs"] == 1

    run(go())


def test_upload_temp_dir_cleanup(make_client, tmp_path, monkeypatch):
    """Neither rejected nor completed uploads may leak their temp dir
    (reference cleans up in finally, api_server.py:160-164)."""
    import tempfile

    upload_root = tmp_path / "uploads"
    upload_root.mkdir()
    monkeypatch.setattr(tempfile, "tempdir", str(upload_root))

    async def go():
        async with make_client() as client:
            # rejected extension: dir must be gone immediately
            resp = await upload(client, filename="evil.exe")
            assert resp.status == 400
            assert os.listdir(upload_root) == []
            # missing file part: same (content_type forces multipart)
            data = aiohttp.FormData()
            data.add_field("language", "en", content_type="text/plain")
            resp = await client.post("/analyze/", data=data)
            assert resp.status == 400
            assert os.listdir(upload_root) == []
            # success path: job owns the dir and removes it when done
            resp = await upload(client, formats="json")
            d = await resp.json()
            await wait_done(client, d["job_id"])
            assert os.listdir(upload_root) == []

    run(go())


def test_upload_too_large_cleanup(make_client, tmp_path, monkeypatch):
    import tempfile

    upload_root = tmp_path / "uploads"
    upload_root.mkdir()
    monkeypatch.setattr(tempfile, "tempdir", str(upload_root))

    async def go():
        cfg = AriesConfig()
        cfg.server.output_root = str(tmp_path / "outputs")
        cfg.server.job_store_path = str(tmp_path / "jobs.json")
        cfg.server.max_upload_mb = 0
        app = create_app(cfg, pipeline_fn=fake_pipeline)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await upload(client)
            assert resp.status == 413
            assert os.listdir(upload_root) == []
        finally:
            await client.close()

    run(go())


# ---------------------------------------------------------------------------
# Job store unit tests
# ---------------------------------------------------------------------------


def test_jobstore_persistence(tmp_path):
    path = str(tmp_path / "jobs.json")
    store = JobStore(path)
    jid = store.create("a.wav")
    store.update(jid, status="completed", progress=100,
                 result={"outputs": {}})
    store2 = JobStore(path)
    job = store2.get(jid)
    assert job is not None
    assert job.status == "completed"
    assert job.filename == "a.wav"


def test_jobstore_crash_recovery(tmp_path):
    path = str(tmp_path / "jobs.json")
    store = JobStore(path)
    jid = store.create("a.wav")
    store.update(jid, status="running", progress=50)
    # simulate restart: the running job must be marked failed, not stuck
    store2 = JobStore(path)
    job = store2.get(jid)
    assert job.status == "failed"
    assert "restarted" in job.error


def test_jobstore_corrupt_file(tmp_path):
    path = tmp_path / "jobs.json"
    path.write_text("{not json")
    store = JobStore(str(path))
    assert store.list_jobs() == []
    jid = store.create("x.wav")
    assert store.get(jid) is not None


def test_jobstore_cleanup_age_gc(tmp_path):
    """cleanup() drops old completed/failed jobs, keeps fresh + active ones."""
    from datetime import datetime, timedelta

    path = str(tmp_path / "jobs.json")
    store = JobStore(path)
    old_done = store.create("old.wav")
    store.update(old_done, status="completed")
    old_failed = store.create("oldfail.wav")
    store.update(old_failed, status="failed", error="x")
    fresh = store.create("fresh.wav")
    store.update(fresh, status="completed")
    active = store.create("active.wav")
    store.update(active, status="running")

    # backdate the two old jobs' completion stamps by 10 days
    past = (datetime.now() - timedelta(days=10)).isoformat()
    store.get(old_done).completed_at = past
    store.get(old_failed).completed_at = past

    removed = store.cleanup(max_age_s=7 * 24 * 3600)
    assert removed == 2
    assert store.get(old_done) is None and store.get(old_failed) is None
    assert store.get(fresh) is not None
    assert store.get(active) is not None
    # persisted: a reloaded store agrees (running -> failed via recovery)
    store2 = JobStore(path)
    assert store2.get(old_done) is None
    assert store2.get(fresh) is not None
