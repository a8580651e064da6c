"""Server + client integration: the reference's manual test flow
(test_api.py upload->poll->download; quick_api_test.py smoke) executed
against a real aiohttp server on a live port with a faked model stage."""

import asyncio
import threading
import time

import pytest

pytest.importorskip("aiohttp")
pytest.importorskip("requests")

from whisper_aries_tpu.cli import clients
from whisper_aries_tpu.config import AriesConfig
from whisper_aries_tpu.serve.server import create_app
from tests.test_server import fake_pipeline


@pytest.fixture
def live_server(tmp_path):
    """Run the real app in a background event-loop thread; yield its URL."""
    from aiohttp import web

    cfg = AriesConfig()
    cfg.server.output_root = str(tmp_path / "outputs")
    cfg.server.job_store_path = str(tmp_path / "jobs.json")
    app = create_app(cfg, pipeline_fn=fake_pipeline)

    loop = asyncio.new_event_loop()
    started = threading.Event()
    state = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            state["port"] = runner.addresses[0][1]
            state["runner"] = runner
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(10)
    url = f"http://127.0.0.1:{state['port']}"
    yield url
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)


def test_client_health(live_server):
    health = clients.check_health(live_server)
    assert health["status"] == "ready"


def test_client_full_flow(live_server, tmp_path):
    wav = tmp_path / "speech.wav"
    wav.write_bytes(b"RIFFfake-but-extension-is-what-matters")
    up = clients.upload_file_for_analysis(
        str(wav), live_server, language="en", formats="json,html",
        run_llm_analysis=False,
    )
    assert up["status"] == "queued"
    job = clients.wait_for_job_completion(
        up["job_id"], live_server, timeout_s=15, poll_s=0.2, progress=None
    )
    assert job["status"] == "completed"
    dest = str(tmp_path / "result.json")
    clients.download_result(up["job_id"], "json", dest, live_server)
    assert b"segments" in open(dest, "rb").read()


def test_client_quick_test(live_server, tmp_path, capsys):
    wav = tmp_path / "sample.wav"
    wav.write_bytes(b"RIFFfake")
    ok = clients.quick_test(str(wav), live_server, budget_s=15)
    assert ok
    out = capsys.readouterr().out
    assert "job:" in out and "downloaded:" in out
