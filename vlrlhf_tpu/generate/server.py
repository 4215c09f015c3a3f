"""Live serving daemon — the reference's sglang-server role as a real
endpoint.

The reference's fast eval path talks to an sglang Runtime, either
in-process or over HTTP to a remote machine
(/root/reference/src/vlrlhf/eval/utils.py:123-173 `run_vqa_sgl`, 32 client
threads against `RuntimeEndpoint`). Our in-process engine already replaces
the Runtime; this module adds the ENDPOINT: a scheduler thread drives
ContinuousEngine.serve() from a thread-safe source, so requests arriving
from concurrent HTTP clients admit into cache slots the moment one frees —
cross-request continuous batching, not per-client batches.

Layers:
  QueueSource  — source protocol impl over a deque + condition variable;
                 the scheduler idles in wait() when no work is queued.
  EngineServer — owns the scheduler thread; submit(Request) -> Future.
  RequestBuilder — text+image -> engine Request (prompt templating, image
                 token expansion, pixel loading), mirroring
                 eval/harness.py _prompt_row / _run_vqa_continuous.
  serve_http   — stdlib ThreadingHTTPServer: POST /generate
                 {"question", "image"?, "max_new_tokens"?} -> {"text"},
                 GET /health. Text in, text out: the server owns the
                 processor and the tokenizer decode.
"""

from __future__ import annotations

import json
import threading
from collections import deque
from concurrent.futures import Future
from typing import Any, Optional

import numpy as np

from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request

PyTree = Any


class QueueSource:
    """Thread-safe request source for ContinuousEngine.serve()."""

    def __init__(self):
        self._dq: deque = deque()
        self._cv = threading.Condition()
        self._closed = False

    def push(self, ridx: int, req: Request) -> None:
        with self._cv:
            if self._closed:
                raise RuntimeError("server is shutting down")
            self._dq.append((ridx, req))
            self._cv.notify()

    def take(self):
        with self._cv:
            return self._dq.popleft() if self._dq else None

    def pending(self) -> int:
        with self._cv:
            return len(self._dq)

    def done(self) -> bool:
        with self._cv:
            return self._closed and not self._dq

    def wait(self) -> None:
        with self._cv:
            self._cv.wait_for(
                lambda: bool(self._dq) or self._closed, timeout=0.1
            )

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()


class OverloadedError(RuntimeError):
    """Backpressure signal: the request queue is at max depth (HTTP 503)."""


class EngineServer:
    """Scheduler thread over a ContinuousEngine; submit() -> Future of the
    response token list."""

    def __init__(self, engine: ContinuousEngine, params: PyTree, rng=None,
                 max_queue: int = 256):
        self.engine = engine
        self.params = params
        self._rng = rng
        self.max_queue = max_queue  # backpressure: refuse past this depth
        self._src = QueueSource()
        self._futures: dict[int, Future] = {}
        self._stream_cbs: dict[int, Any] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._thread: Optional[threading.Thread] = None
        import time

        self._t0 = time.time()
        self._done = 0
        self._tokens = 0
        self._dead: Optional[BaseException] = None

    def start(self) -> "EngineServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def _loop(self):
        try:
            self.engine.serve(
                self.params, self._src, self._finish, rng=self._rng,
                on_token=self._on_token,
            )
        except BaseException as e:  # noqa: BLE001 — fail pending futures
            with self._lock:
                # dead is set BEFORE the futures swap: any submit() that
                # raced past the liveness check is either already in
                # `futs` (failed below) or will see _dead and raise — no
                # orphaned Future can hang a client forever
                self._dead = e
                futs, self._futures = self._futures, {}
            self._src.close()
            for f in futs.values():
                if not f.done():
                    f.set_exception(e)

    def _on_token(self, ridx: int, tok: int):
        cb = self._stream_cbs.get(ridx)
        if cb is not None:
            cb(tok)

    def _finish(self, ridx: int, tokens: list[int]):
        with self._lock:
            fut = self._futures.pop(ridx)
            self._stream_cbs.pop(ridx, None)
            self._done += 1
            self._tokens += len(tokens)
        fut.set_result(tokens)

    def stats(self) -> dict:
        import time

        with self._lock:
            dt = max(time.time() - self._t0, 1e-9)
            return {
                "requests_done": self._done,
                "requests_inflight": len(self._futures),
                "tokens_out": self._tokens,
                "tokens_per_sec": round(self._tokens / dt, 2),
                "uptime_s": round(dt, 1),
            }

    def submit(self, req: Request, on_token=None) -> Future:
        need = len(req.input_ids) + (
            req.max_new_tokens or self.engine.gen_cfg.max_new_tokens
        )
        if need > self.engine.cache_len:
            raise ValueError(
                f"request needs {need} cache slots, engine has "
                f"{self.engine.cache_len}"
            )
        if self._src.pending() >= self.max_queue:
            raise OverloadedError(
                f"queue full ({self.max_queue} pending) — retry later"
            )
        fut: Future = Future()
        with self._lock:
            if self._dead is not None:
                raise RuntimeError(
                    f"engine scheduler died: {self._dead!r}"
                ) from self._dead
            ridx = self._next_id
            self._next_id += 1
            self._futures[ridx] = fut  # registered BEFORE the scheduler
            # can possibly take+finish it
            if on_token is not None:
                self._stream_cbs[ridx] = on_token
        try:
            self._src.push(ridx, req)
        except RuntimeError:
            with self._lock:
                self._futures.pop(ridx, None)
            raise
        return fut

    @property
    def alive(self) -> bool:
        return self._dead is None and (
            self._thread is not None and self._thread.is_alive()
        )

    def stop(self, timeout: float = 30.0):
        self._src.close()
        if self._thread is not None:
            self._thread.join(timeout=timeout)


class RequestBuilder:
    """question/image -> engine Request (eval/harness.py _prompt_row +
    _run_vqa_continuous request construction, shared here so the HTTP
    server and the eval harness expand prompts identically)."""

    def __init__(self, processor, collator_cfg, image_loader=None):
        from vlrlhf_tpu.data.collators import GenerationCollator

        self.processor = processor
        self.collator = GenerationCollator(
            processor, collator_cfg, image_loader
        )

    def build(
        self,
        question: str,
        img_path: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        adapter_idx: int = 0,
    ) -> Request:
        from vlrlhf_tpu.data.processor import make_single_turn_conv

        proc = self.processor
        n_img = 0 if img_path is None else (
            len(img_path) if isinstance(img_path, list) else 1
        )
        prompt = proc.format_multimodal_prompt(question, n_img)
        conv = make_single_turn_conv(prompt, "")
        ids = proc.maybe_prefix_image_ids(
            proc.process_conv(conv)["input_ids"], n_img
        )
        prow = {"input_ids": ids, "img_path": img_path}
        if proc.qformer_tokenizer is not None:
            prow["qformer_input_ids"] = proc.qformer_ids(question)
        b = self.collator([prow])
        plen = int(b["prompt_lens"][0])
        has_img = img_path is not None
        if b.get("anyres_gather") is not None and has_img:
            pv, gather = b["pixel_values"][0], b["anyres_gather"][0]
        elif has_img:
            pv, gather = b["pixel_values"][0, 0], None
        else:
            pv = gather = None
        return Request(
            input_ids=np.asarray(b["input_ids"][0, :plen]),
            pixel_values=pv,
            image_positions=(
                np.asarray(b["image_positions"][0]) if has_img else None
            ),
            qformer_input_ids=prow.get("qformer_input_ids"),
            anyres_gather=gather,
            max_new_tokens=max_new_tokens,
            adapter_idx=adapter_idx,
        )


class ChatBackend:
    """Multi-turn /chat sessions over the engine's ChatSession (chunked
    prefill into a live per-session cache — no re-prefill of the
    conversation each turn, the sglang-server session-reuse role).

    One cache per session (cache_len slots), LRU-capped at max_sessions —
    at 7B a 512-slot bf16 cache is ~0.5 GiB/session, so sessions are an
    explicit opt-in budget (--chat_sessions). Turn N+1 tokens are the
    template delta `assistant_end + user_begin + msg + user_end +
    assistant_begin` tokenized standalone; assistant_end's leading
    terminator doubles as the previous response's stop token, whose kv
    the decode loop never wrote (ChatSession.extend contract). One chat
    op runs at a time (the device serializes anyway); sessions share the
    Generator's compiled programs."""

    def __init__(
        self,
        model_cfg,
        params: PyTree,
        processor,
        collator_cfg,
        gen_cfg,
        cache_len: int = 1024,
        max_sessions: int = 4,
        image_loader=None,
    ):
        from vlrlhf_tpu.data.collators import GenerationCollator
        from vlrlhf_tpu.generate.engine import Generator

        self.params = params
        self.processor = processor
        self.template = processor.template
        self.gen_cfg = gen_cfg
        self.cache_len = cache_len
        self.max_sessions = max_sessions
        self._gen = Generator(model_cfg, gen_cfg)
        self._collator = GenerationCollator(
            processor, collator_cfg, image_loader
        )
        from collections import OrderedDict

        self._sessions: "OrderedDict[str, Any]" = OrderedDict()
        self._lock = threading.Lock()
        self._counter = 0

    def _strip(self, row) -> str:
        stop = set(int(t) for t in (self.gen_cfg.eos_token_ids or ()))
        stop.add(int(self.gen_cfg.pad_token_id))
        keep = []
        for t in np.asarray(row).tolist():
            if int(t) in stop:
                break
            keep.append(int(t))
        return self.processor.tokenizer.decode(
            keep, skip_special_tokens=True
        ).strip()

    def chat(self, message: str, session_id: Optional[str] = None,
             image: Optional[str] = None) -> tuple[str, str]:
        """Returns (response_text, session_id)."""
        from vlrlhf_tpu.data.processor import make_single_turn_conv
        from vlrlhf_tpu.generate.engine import ChatSession

        with self._lock:
            proc = self.processor
            if session_id is None or session_id not in self._sessions:
                self._counter += 1
                session_id = session_id or f"s{self._counter}"
                n_img = 0 if image is None else 1
                prompt = proc.format_multimodal_prompt(message, n_img)
                conv = make_single_turn_conv(prompt, "")
                ids = proc.maybe_prefix_image_ids(
                    proc.process_conv(conv)["input_ids"], n_img
                )
                prow = {"input_ids": ids, "img_path": image}
                if proc.qformer_tokenizer is not None:
                    prow["qformer_input_ids"] = proc.qformer_ids(message)
                batch = self._collator([prow])
                sess = ChatSession(self._gen, cache_len=self.cache_len)
                out = sess.start(self.params, batch)
                self._sessions[session_id] = sess
                while len(self._sessions) > self.max_sessions:
                    self._sessions.popitem(last=False)  # LRU evict
            else:
                sess = self._sessions.pop(session_id)
                self._sessions[session_id] = sess  # move to MRU
                t = self.template
                delta = (
                    t.assistant_end + t.user_begin + message + t.user_end
                    + t.assistant_begin
                )
                ids = proc.tokenizer.encode(delta, add_special_tokens=False)
                new_ids = np.asarray([ids], np.int32)
                out = sess.extend(
                    new_ids, np.asarray([len(ids)], np.int32)
                )
            return self._strip(np.asarray(out)[0]), session_id


class EndpointRunner:
    """HTTP client runner for run_benchmark — the reference's REMOTE
    run_vqa_sgl mode (eval/utils.py:146-152: RuntimeEndpoint + run_batch
    with 32 threads). Drop-in for EvalRunner's generation surface; the
    model lives in a `vlrlhf serve` process (possibly on another host)."""

    def __init__(self, endpoint: str, num_threads: int = 32,
                 timeout: float = 600.0):
        self.endpoint = endpoint.rstrip("/")
        self.num_threads = num_threads
        self.timeout = timeout

    def _one(self, question: str, image, max_new_tokens=None) -> str:
        import urllib.request

        body = json.dumps({
            "question": question,
            "image": image,
            "max_new_tokens": max_new_tokens,
        }).encode()
        req = urllib.request.Request(
            self.endpoint + "/generate", data=body,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            out = json.loads(r.read())
        if "error" in out:
            raise RuntimeError(out["error"])
        return out["text"]

    def run_vqa(self, rows, batch_size: int = 16, prompt_key: str =
                "question", image_key: str = "img", progress: bool = False):
        from concurrent.futures import ThreadPoolExecutor

        rows = [dict(r) for r in rows]
        with ThreadPoolExecutor(self.num_threads) as ex:
            texts = list(ex.map(
                lambda r: self._one(r[prompt_key], r.get(image_key)), rows
            ))
        for r, t in zip(rows, texts):
            r["response"] = t
        return rows

    def run_vqa_ppl(self, rows, batch_size: int = 16, prompt_key: str =
                    "question", answer_key: str = "answer",
                    image_key: str = "img", progress: bool = False):
        """Remote CE-ranking: POST /score per chunk. The reference's sgl
        path cannot do this at all (generate-only) — ppl benchmarks
        (SEEDBench CE mode, MMBench ppl) work against our daemon."""
        import urllib.request

        rows = [dict(r) for r in rows]
        out = []
        for start in range(0, len(rows), batch_size):
            chunk = rows[start : start + batch_size]
            body = json.dumps({"rows": [
                {"question": r[prompt_key], "answer": r[answer_key],
                 "image": r.get(image_key)} for r in chunk
            ]}).encode()
            req = urllib.request.Request(
                self.endpoint + "/score", data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                res = json.loads(r.read())
            if "error" in res:
                raise RuntimeError(res["error"])
            for row, ppl in zip(chunk, res["ppl"]):
                row["ppl"] = float(ppl)
                out.append(row)
        return out


def serve_http(
    server: EngineServer,
    builder: RequestBuilder,
    tokenizer,
    host: str = "127.0.0.1",
    port: int = 8000,
    request_timeout: float = 600.0,
    chat: Optional[ChatBackend] = None,
    scorer=None,
    adapter_names: Optional[list] = None,  # multi-adapter registry: body
    # "adapter": name -> Request.adapter_idx (engine adapter_sets order)  # callable(rows) -> rows with 'ppl' (EvalRunner.run_vqa_ppl
    # under a lock); enables remote CE-ranking benchmarks via /score
):
    """Blocking HTTP front-end. Returns the HTTPServer (call .shutdown()
    from another thread to stop); pass port=0 for an ephemeral port
    (server.server_address[1])."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

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

        def do_GET(self):
            if self.path == "/health":
                self._json(200 if server.alive else 500, {
                    "ok": server.alive,
                    "slots": server.engine.n_slots,
                    "cache_len": server.engine.cache_len,
                })
            elif self.path == "/metrics":
                self._json(200, server.stats())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/score":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if scorer is None:
                        self._json(400, {"error": "scoring disabled"})
                        return
                    rows = [
                        {"question": r["question"], "answer": r["answer"],
                         "img": r.get("image")}
                        for r in body["rows"]
                    ]
                    scored = scorer(rows)
                    self._json(200, {"ppl": [r["ppl"] for r in scored]})
                except Exception as e:  # noqa: BLE001
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path == "/chat":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if chat is None:
                        self._json(400, {
                            "error": "chat sessions disabled "
                                     "(--chat_sessions 0)"
                        })
                        return
                    text, sid = chat.chat(
                        body["message"], body.get("session_id"),
                        body.get("image"),
                    )
                    self._json(200, {"text": text, "session_id": sid})
                except Exception as e:  # noqa: BLE001
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                aidx = 0
                if body.get("adapter") is not None:
                    if not adapter_names or (
                        body["adapter"] not in adapter_names
                    ):
                        self._json(400, {
                            "error": f"unknown adapter "
                                     f"{body['adapter']!r}; registered: "
                                     f"{adapter_names or []}"
                        })
                        return
                    aidx = adapter_names.index(body["adapter"])
                req = builder.build(
                    body["question"],
                    body.get("image"),
                    body.get("max_new_tokens"),
                    adapter_idx=aidx,
                )
                if body.get("stream"):
                    self._stream(req)
                    return
                toks = server.submit(req).result(timeout=request_timeout)
                text = tokenizer.decode(
                    list(toks), skip_special_tokens=True
                ).strip()
                self._json(200, {"text": text, "tokens": len(toks)})
            except OverloadedError as e:
                self._json(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — report to the client
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def _stream(self, req):
            """Server-sent events: text deltas as bursts land, then [DONE].
            Granularity is the engine's decode burst (tokens reach the host
            per packed download, not one by one — the right streaming unit
            over a high-latency control link)."""
            import queue as _q

            tq: "_q.Queue" = _q.Queue()
            fut = server.submit(req, on_token=tq.put)
            fut.add_done_callback(lambda f: tq.put(None))
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            ids: list[int] = []
            prev = ""
            while True:
                tok = tq.get(timeout=request_timeout)
                if tok is None:
                    break
                ids.append(int(tok))
                text = tokenizer.decode(ids, skip_special_tokens=True)
                delta, prev = text[len(prev):], text
                if delta:
                    self.wfile.write(
                        f"data: {json.dumps({'delta': delta})}\n\n".encode()
                    )
                    self.wfile.flush()
            err = fut.exception()
            if err is not None:
                self.wfile.write(
                    f"data: {json.dumps({'error': str(err)})}\n\n".encode()
                )
            self.wfile.write(b"data: [DONE]\n\n")

    httpd = ThreadingHTTPServer((host, port), Handler)
    return httpd
