"""Benchmark orchestrator smoke test against the stub judge."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _StubJudge(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        _ = self.rfile.read(n)
        body = json.dumps(
            {"choices": [{"message": {"content": "{'score': 3}"}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_orchestrator(tmp_path):
    from video_llava_tpu.eval.evaluate_benchmark import main

    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubJudge)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    api = f"http://127.0.0.1:{server.server_address[1]}/v1"

    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    general = [
        {"video_name": "v1", "question": "q", "answer": "a", "pred": "p"},
        {"video_name": "v2", "question": "q", "answer": "a", "pred": "p"},
    ]
    consistency = [
        {"video_name": "v1", "Q1": "q1", "Q2": "q2", "A": "a",
         "pred1": "p", "pred2": "p"}
    ]
    (pred_dir / "general.json").write_text(json.dumps(general))
    (pred_dir / "consistency.json").write_text(json.dumps(consistency))

    out_dir = tmp_path / "out"
    main(["--pred_dir", str(pred_dir), "--output_dir", str(out_dir),
          "--api_base", api, "--num_tasks", "2"])
    summary = json.loads((out_dir / "benchmark_summary.json").read_text())
    assert summary["correctness"]["average_score"] == 3.0
    assert summary["consistency"]["average_score"] == 3.0
    assert "temporal" not in summary  # temporal.json absent -> skipped
    server.shutdown()
