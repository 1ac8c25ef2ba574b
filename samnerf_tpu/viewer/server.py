"""Websocket broadcast server for the viewer.

Reference: ``nerfstudio/viewer/viser/server.py:31-68`` (ViserServer over
``viser.infra``) + the send helpers in ``viewer/viser/message_api.py``
(set_background_image :393-407, use_sam/clear_sam_pins/update_fps
:425, :542-553).

Self-contained asyncio ``websockets`` server on a daemon thread: incoming
messages are decoded and dispatched to registered handlers; outgoing
messages broadcast to every client, with per-redundancy-key buffering so a
late-joining client receives the latest state (what viser.infra's
persistent message buffer does).
"""
from __future__ import annotations

import asyncio
import base64
import io
import threading
from typing import Callable, Dict, List, Optional, Type

import numpy as np

from samnerf_tpu.viewer import messages as m


class ViewerServer:
    def __init__(self, host: str = "0.0.0.0", port: int = 7007):
        self.host = host
        self.port = port
        self._handlers: Dict[Type[m.Message], List[Callable]] = {}
        self._buffer: Dict[str, m.Message] = {}  # redundancy_key -> latest
        self._clients: set = set()
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._thread: Optional[threading.Thread] = None
        self._started = threading.Event()
        self._stop_future: Optional[asyncio.Future] = None

    # --- lifecycle ---------------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self._started.wait(timeout=10)

    def stop(self):
        """Shut the event loop down and join the server thread.  Safe to
        call more than once (and from atexit): a daemon thread left inside
        asyncio at interpreter teardown dies mid-syscall, which used to
        surface as 'FATAL: exception not rethrown' / stray tracebacks
        after a green test run."""
        loop, fut = self._loop, self._stop_future
        if loop is not None and fut is not None:
            def _finish():
                if not fut.done():
                    fut.set_result(None)
            try:
                loop.call_soon_threadsafe(_finish)
            except RuntimeError:
                pass  # loop already closed
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _run(self):
        asyncio.run(self._main())

    async def _main(self):
        import websockets
        self._loop = asyncio.get_running_loop()
        self._stop_future = self._loop.create_future()
        async with websockets.serve(self._handle_client, self.host, self.port,
                                    max_size=None):
            self._started.set()
            await self._stop_future

    async def _handle_client(self, ws):
        self._clients.add(ws)
        try:
            # replay buffered state to the new client
            for msg in list(self._buffer.values()):
                await ws.send(msg.serialize())
            async for data in ws:
                try:
                    msg = m.Message.deserialize(data)
                except Exception:
                    continue
                for handler in self._handlers.get(type(msg), []):
                    try:
                        handler(msg)
                    except Exception:
                        # a buggy handler must not tear down the client
                        # connection (the reference's viser bridge also
                        # survives handler errors)
                        import traceback
                        traceback.print_exc()
        finally:
            self._clients.discard(ws)

    # --- API ----------------------------------------------------------------
    def register_handler(self, msg_type: Type[m.Message],
                         handler: Callable) -> None:
        self._handlers.setdefault(msg_type, []).append(handler)

    def broadcast(self, msg: m.Message) -> None:
        self._buffer[msg.redundancy_key()] = msg
        if self._loop is None:
            return
        data = msg.serialize()

        def _send():
            for ws in list(self._clients):
                asyncio.ensure_future(ws.send(data))

        self._loop.call_soon_threadsafe(_send)

    # --- convenience senders (message_api.py names) -------------------------
    def set_background_image(self, image: np.ndarray,
                             file_format: str = "jpeg",
                             quality: int = 70) -> None:
        """uint8 [H, W, 3] -> base64 BackgroundImageMessage
        (``message_api.py:393-407``)."""
        from PIL import Image
        buf = io.BytesIO()
        pil = Image.fromarray(image)
        if file_format == "jpeg":
            pil.save(buf, format="JPEG", quality=quality)
            media = "image/jpeg"
        else:
            pil.save(buf, format="PNG")
            media = "image/png"
        self.broadcast(m.BackgroundImageMessage(
            media_type=media,
            base64_data=base64.b64encode(buf.getvalue()).decode("ascii")))

    def send_status_message(self, eval_res: str, step: int) -> None:
        self.broadcast(m.StatusMessage(eval_res=eval_res, step=step))

    def set_training_state(self, state: str) -> None:
        self.broadcast(m.TrainingStateMessage(training_state=state))

    def update_scene_box(self, aabb_min, aabb_max) -> None:
        self.broadcast(m.SceneBoxMessage(min=tuple(aabb_min),
                                         max=tuple(aabb_max)))

    def add_dataset_image(self, idx: str, json: dict) -> None:
        """Camera frustum + thumbnail for one training view
        (``message_api.py:436-444``)."""
        self.broadcast(m.DatasetImageMessage(idx=idx, json=json))

    def send_file_path_info(self, config_base_dir: str, data_base_dir: str,
                            export_path_name: str) -> None:
        """``message_api.py:158-172``."""
        self.broadcast(m.FilePathInfoMessage(
            config_base_dir=str(config_base_dir),
            data_base_dir=str(data_base_dir),
            export_path_name=str(export_path_name)))

    def use_sam(self, use: bool) -> None:
        self.broadcast(m.SamMessage(use_sam=use))

    def clear_sam_pins(self) -> None:
        self.broadcast(m.ClearSamPinsMessage())

    def update_fps(self, fps: float) -> None:
        self.broadcast(m.FPSMessage(fps=fps))


def serve_client(http_port: int = 7008, ws_port: int = 7007,
                 host: str = "0.0.0.0") -> threading.Thread:
    """Serve the bundled HTML viewer client over HTTP.

    Replaces the reference's `npm start`-built React app hosting
    (``nerfstudio/viewer/app``): open
    ``http://<host>:<http_port>/?port=<ws_port>`` in a browser.
    Returns the daemon server thread.
    """
    import functools
    import http.server
    import os

    client_dir = os.path.join(os.path.dirname(__file__), "client")

    class _Quiet(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a, **k):
            pass

    handler = functools.partial(_Quiet, directory=client_dir)
    httpd = http.server.ThreadingHTTPServer((host, http_port), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return t
