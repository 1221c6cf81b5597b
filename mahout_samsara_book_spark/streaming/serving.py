"""Minimal HTTP model-serving wrapper (SURVEY §2D D5; reference
``Main.scala:6-20`` + ``TomcatServer.scala:12-24`` — embedded Tomcat on
``/app/country``).

Out-of-engine by design (SURVEY §7: 'it is not engine'): a stdlib
ThreadingHTTPServer fronting an in-core :class:`NBServingModel`. POST a
line of text, receive the predicted label — the servlet's doPost contract
(``NaiveBayesServlet.scala:68-71``). After init no Spark involvement, like
the reference's serve path (SURVEY §3 entry point 3).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from mahout_samsara_book_spark.algorithms.naive_bayes import NBServingModel


class NBHttpServer:
    def __init__(self, model: NBServingModel, host: str = "127.0.0.1", port: int = 0):
        srv_model = model

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                text = self.rfile.read(length).decode("utf-8")
                label = str(srv_model.classify_text(text))
                body = label.encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "NBHttpServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
