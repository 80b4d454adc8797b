"""Python client for :class:`inpaintnet_tpu.server.InpaintingServer`.

Thin stdlib-only wrapper around the HTTP endpoints (docs/SERVING.md) with
the npy bulk transport as the default for token arrays — JSON encode/
decode of bulk batches costs more than the device step (measured in
docs/SERVING.md "Bulk transport"), and at high request rates the server's
per-request JSON parse is the host bottleneck (the dynamic-batching
benchmark, benchmarks/bench_server_batching.py).

    from inpaintnet_tpu.client import InpaintingClient

    c = InpaintingClient("127.0.0.1", 8000)
    c.meta()                                   # model geometry
    out = c.inpaint(tokens, 8, 2, seed=7)      # (B, M, 24) -> same shape
    var = c.inpaint_variations(tokens, 8, 2, num_variations=15)
    row = c.inpaint_ticks(score_row, 24 * 7, 24 * 9)

The client keeps one persistent HTTP/1.1 connection (reopened on error);
it is NOT thread-safe — use one client per thread (the server coalesces
concurrent requests into shared device batches when started with
``batching=True``, so many small clients are cheap).
"""
from __future__ import annotations

import http.client
import io
import json
from typing import Optional

import numpy as np

__all__ = ["InpaintingClient", "ServerError"]


class ServerError(RuntimeError):
    """Non-2xx response; carries the HTTP status and server message."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


class InpaintingClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 8000,
                 timeout: float = 300.0, transport: str = "npy"):
        """:param transport: ``"npy"`` (default — raw array bytes, scalar
        fields as query parameters) or ``"json"``."""
        assert transport in ("npy", "json"), transport
        self.host, self.port, self.timeout = host, port, timeout
        self.transport = transport
        self._conn: Optional[http.client.HTTPConnection] = None

    # ------------------------------------------------------------------ #
    def _connection(self) -> http.client.HTTPConnection:
        if self._conn is None:
            self._conn = http.client.HTTPConnection(
                self.host, self.port, timeout=self.timeout
            )
        return self._conn

    def close(self):
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _request(self, method: str, path: str, body=None, headers=None):
        """One request with a single reconnect retry (keep-alive
        connections die on server restarts/idle timeouts)."""
        for attempt in (0, 1):
            conn = self._connection()
            try:
                conn.request(method, path, body=body,
                             headers=headers or {})
                resp = conn.getresponse()
                data = resp.read()
                return resp, data
            except (ConnectionError, http.client.HTTPException, OSError):
                self.close()
                if attempt:
                    raise

    @staticmethod
    def _error_message(data: bytes) -> str:
        """Best-effort server message — error bodies are JSON from our
        server but can be HTML/empty from proxies or the stdlib layer."""
        try:
            out = json.loads(data)
            return out.get("error", str(out)) if isinstance(out, dict) \
                else str(out)
        except ValueError:
            return data[:200].decode(errors="replace")

    def _get_json(self, path: str) -> dict:
        resp, data = self._request("GET", path)
        if resp.status != 200:
            raise ServerError(resp.status, self._error_message(data))
        return json.loads(data)

    def _post(self, path: str, tokens: np.ndarray, scalars: dict,
              out_field: str) -> np.ndarray:
        scalars = {k: v for k, v in scalars.items() if v is not None}
        if self.transport == "npy":
            q = "&".join(
                f"{k}={float(v)}" if k == "temperature" else f"{k}={int(v)}"
                for k, v in scalars.items()
            )
            buf = io.BytesIO()
            np.save(buf, np.ascontiguousarray(tokens, dtype=np.int32))
            resp, data = self._request(
                "POST", f"{path}?{q}", body=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"},
            )
            if resp.status != 200:
                raise ServerError(resp.status, self._error_message(data))
            return np.load(io.BytesIO(data), allow_pickle=False)
        return self._post_json(
            path, {"tokens": np.asarray(tokens).tolist(), **scalars},
            out_field,
        )

    def _post_json(self, path: str, payload: dict,
                   out_field: str) -> np.ndarray:
        """One JSON POST -> array; single copy of the status/error/parse
        sequence (used by the json transport and the field-structured
        interpolate payload)."""
        resp, data = self._request(
            "POST", path, body=json.dumps(payload),
            headers={"Content-Type": "application/json"},
        )
        if resp.status != 200:
            raise ServerError(resp.status, self._error_message(data))
        return np.asarray(json.loads(data)[out_field])

    # ------------------------------------------------------------------ #
    def health(self) -> dict:
        return self._get_json("/healthz")

    def meta(self) -> dict:
        return self._get_json("/v1/meta")

    def inpaint(self, tokens, start_measure: int, num_measures: int,
                seed: Optional[int] = None) -> np.ndarray:
        """(B, M, msl) int tokens (or a single (M, msl) example) ->
        same shape with measures [start, start+num) regenerated."""
        return self._post("/v1/inpaint", tokens, {
            "start_measure": start_measure, "num_measures": num_measures,
            "seed": seed,
        }, "tokens")

    def inpaint_variations(self, tokens, start_measure: int,
                           num_measures: int, num_variations: int,
                           seed: Optional[int] = None) -> np.ndarray:
        """-> (num_variations, B, M, msl) (or (num_variations, M, msl)
        for a single example)."""
        return self._post("/v1/inpaint_variations", tokens, {
            "start_measure": start_measure, "num_measures": num_measures,
            "num_variations": num_variations, "seed": seed,
        }, "variations")

    def inpaint_ticks(self, tokens, start_tick: int, end_tick: int,
                      seed: Optional[int] = None) -> np.ndarray:
        """The reference tester's tick-range contract: one flat tick
        sequence, measure-aligned [start, end) range."""
        return self._post("/v1/inpaint_ticks", tokens, {
            "start_tick": start_tick, "end_tick": end_tick, "seed": seed,
        }, "tokens")

    def interpolate(self, measure_a, measure_b,
                    num_points: int) -> np.ndarray:
        """Latent interpolation between two (msl,) measures -> tokens of
        shape (num_points + 2, msl), endpoints included. Deterministic."""
        pair = np.stack([np.asarray(measure_a), np.asarray(measure_b)])
        if self.transport == "npy":
            return self._post("/v1/interpolate", pair,
                              {"num_points": num_points}, "tokens")
        return self._post_json("/v1/interpolate", {
            "measure_a": np.asarray(measure_a).tolist(),
            "measure_b": np.asarray(measure_b).tolist(),
            "num_points": num_points,
        }, "tokens")

    def arnn_inpaint(self, tokens, start_measure: int, num_measures: int,
                     seed: Optional[int] = None,
                     temperature: Optional[float] = None) -> np.ndarray:
        """AnticipationRNN constraint inpainting (the reference's second
        model family; requires the server to be started with an ARNN
        checkpoint). Argmax decode unless ``temperature`` is given."""
        return self._post("/v1/arnn/inpaint", tokens, {
            "start_measure": start_measure, "num_measures": num_measures,
            "seed": seed, "temperature": temperature,
        }, "tokens")
