"""Runs dashboard (dashboard.py) — the reference README.md:150 web-app TODO."""
import http.client
import json
import urllib.request

import pytest

from deepcv_tpu.dashboard import DashboardServer, render_run, scan_runs
from deepcv_tpu.train.loggers import ExperimentTracker


@pytest.fixture()
def store(tmp_path):
    for name, acc in [("alpha", 0.5), ("beta", 0.8)]:
        tr = ExperimentTracker(root=str(tmp_path), experiment="exp1",
                               run_name=name)
        tr.log_params({"lr": 1e-3, "model": name})
        tr.set_tags({"pipeline": "train_image_classifier"})
        for step in range(5):
            tr.log_metrics({"loss": 1.0 - 0.1 * step, "accuracy": acc}, step)
        art = tmp_path / f"{name}.txt"
        art.write_text(f"artifact of {name}")
        tr.log_artifact(art)
        tr.end_run()
    return tmp_path


def test_scan_runs_collects_everything(store):
    runs = scan_runs(store)
    assert len(runs) == 2
    by_name = {r["meta"]["run_name"]: r for r in runs}
    assert by_name["alpha"]["params"]["model"] == "alpha"
    assert len(by_name["beta"]["metrics"]) == 5
    assert by_name["beta"]["meta"]["tags"]["pipeline"] == "train_image_classifier"


def test_render_run_embeds_curves_and_params(store):
    run = scan_runs(store)[0]
    page = render_run(run)
    assert "<svg" in page and "loss" in page and "accuracy" in page
    assert "lr" in page and "artifacts" in page


def test_server_end_to_end(store):
    server = DashboardServer(store, port=0).start()
    try:
        index = urllib.request.urlopen(server.url, timeout=10).read().decode()
        assert "exp1" in index and "alpha" in index and "beta" in index
        runs = scan_runs(store)
        run = runs[0]
        page = urllib.request.urlopen(
            f"{server.url}run/exp1/{run['run_id']}", timeout=10
        ).read().decode()
        assert "<svg" in page and run["run_id"] in page
        name = run["meta"]["run_name"]
        art = urllib.request.urlopen(
            f"{server.url}artifact/exp1/{run['run_id']}/artifacts/{name}.txt",
            timeout=10).read().decode()
        assert art == f"artifact of {name}"
    finally:
        server.stop()


def test_server_blocks_path_traversal(store):
    secret = store.parent / "secret.txt"
    secret.write_text("do not serve")
    server = DashboardServer(store, port=0).start()
    try:
        run = scan_runs(store)[0]
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
        # raw request so the ../ segments reach the server un-normalized
        conn.request("GET", f"/artifact/exp1/{run['run_id']}/"
                            "../../../secret.txt")
        resp = conn.getresponse()
        assert resp.status == 404
        body = resp.read().decode()
        assert "do not serve" not in body
        conn.close()
        # unknown run page is a 404, not a crash
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
        conn.request("GET", "/run/exp1/nope")
        assert conn.getresponse().status == 404
        conn.close()
    finally:
        server.stop()


def test_cli_has_dashboard_subcommand():
    from deepcv_tpu.cli import main
    with pytest.raises(SystemExit):
        main(["dashboard", "--help"])
