"""Viewer wire-protocol and state machine tests (real websocket client)."""
import asyncio
import threading
import time

import numpy as np
import pytest

from samnerf_tpu.viewer import messages as m
from samnerf_tpu.viewer.render_state_machine import (
    camera_from_message, get_prompt_points,
    three_js_perspective_camera_focal_length)
from samnerf_tpu.viewer.server import ViewerServer


def make_cam_msg(xs=(), ys=(), moving=False):
    return m.CameraMessage(
        aspect=1.5, render_aspect=1.5, fov=50.0,
        matrix=tuple(np.eye(4).T.flatten().tolist()),
        camera_type="perspective", is_moving=moving, timestamp=0,
        xs=list(xs), ys=list(ys))


def test_message_roundtrip():
    msg = make_cam_msg(xs=[0.5], ys=[0.25])
    data = msg.serialize()
    out = m.Message.deserialize(data)
    assert isinstance(out, m.CameraMessage)
    assert out.fov == 50.0 and out.xs == [0.5]
    # wire format: msgpack map with 'type' == class name (viser.infra compat)
    import msgpack
    raw = msgpack.unpackb(data)
    assert raw["type"] == "CameraMessage"

    for msg2 in (m.SamMessage(use_sam=True), m.ClearSamPinsMessage(),
                 m.TextPromptMessage(text_prompt="a red ball"),
                 m.ThresholdMessage(threshold=0.7), m.FPSMessage(fps=24.0),
                 m.SearchTextMessage(text="ball", switch_to_heat_map=True),
                 m.StatusMessage(eval_res="64x64px", step=7)):
        assert type(m.Message.deserialize(msg2.serialize())) is type(msg2)


def test_prompt_points_and_camera_from_message():
    msg = make_cam_msg(xs=[0.5, 0.1], ys=[0.5, 0.9])
    pts = get_prompt_points(msg, image_height=100, image_width=200)
    np.testing.assert_array_equal(pts, [[100, 50], [20, 90]])
    intrin, c2w = camera_from_message(msg, 100, 150)
    f = three_js_perspective_camera_focal_length(50.0, 100)
    assert abs(intrin[0, 0] - f) < 1e-5
    assert c2w.shape == (3, 4)


def test_websocket_server_roundtrip():
    import websockets.sync.client as wsc

    server = ViewerServer(host="127.0.0.1", port=17117)
    server.start()
    received = []
    server.register_handler(m.TextPromptMessage,
                            lambda msg: received.append(msg.text_prompt))

    with wsc.connect("ws://127.0.0.1:17117", max_size=None) as ws:
        # server -> client broadcast (incl. buffered replay for late joiners)
        server.broadcast(m.StatusMessage(eval_res="32x32px", step=3))
        data = ws.recv(timeout=5)
        out = m.Message.deserialize(data)
        assert isinstance(out, m.StatusMessage) and out.step == 3
        # client -> server dispatch
        ws.send(m.TextPromptMessage(text_prompt="hello").serialize())
        for _ in range(50):
            if received:
                break
            time.sleep(0.1)
        assert received == ["hello"]

    # late joiner gets buffered state
    with wsc.connect("ws://127.0.0.1:17117", max_size=None) as ws2:
        out = m.Message.deserialize(ws2.recv(timeout=5))
        assert isinstance(out, m.StatusMessage) and out.step == 3


def test_control_panel_elements_and_hidden_logic():
    from samnerf_tpu.viewer import messages as m
    from samnerf_tpu.viewer.control_panel import ControlPanel

    class FakeServer:
        def __init__(self):
            self.sent = []
            self.handlers = {}

        def broadcast(self, msg):
            self.sent.append(msg)

        def register_handler(self, t, cb):
            self.handlers[t] = cb

    srv = FakeServer()
    rerenders = []
    panel = ControlPanel(srv, rerender_cb=lambda: rerenders.append(1))
    names = {x.name for x in srv.sent if isinstance(x, m.GuiAddMessage)}
    assert {"Output Render", "Colormap", "Train Util", "Max Res",
            "Enable SAM", "Text Prompt", "Threshold", "TopK"} <= names
    # SAM controls start hidden
    hidden = {x.name for x in srv.sent
              if isinstance(x, m.GuiSetHiddenMessage) and x.hidden}
    assert "Text Prompt" in hidden

    # enabling SAM reveals the group and triggers a rerender
    srv.sent.clear()
    srv.handlers[m.GuiUpdateMessage](m.GuiUpdateMessage(name="Enable SAM",
                                                        value=True))
    shown = {x.name for x in srv.sent
             if isinstance(x, m.GuiSetHiddenMessage) and not x.hidden}
    assert {"Text Prompt", "Threshold", "TopK", "Send"} <= shown
    assert rerenders
    assert panel["Enable SAM"] is True

    # value callback
    got = []
    panel.on("Threshold", got.append)
    srv.handlers[m.GuiUpdateMessage](m.GuiUpdateMessage(name="Threshold",
                                                        value=0.7))
    assert got == [0.7] and panel["Threshold"] == 0.7
