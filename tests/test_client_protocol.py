"""Wire-protocol conformance vs the reference React client.

The reference client decodes messages with msgpackr and types them via the
generated ``ViserMessages.tsx`` (the ground truth of what the original
JS/TS app expects on the wire).  These tests parse that TSX schema and
assert our Python message registry matches it message-for-message and
field-for-field, and that our msgpack bytes decode into exactly the typed
maps the client's `handleMessage` switch consumes
(``ViserWebSocket.tsx:52-``).
"""
import re
from pathlib import Path

import numpy as np
import pytest

from samnerf_tpu.viewer import messages as m

TSX = Path("/root/reference/nerfstudio/viewer/app/src/modules/WebSocket/"
           "ViserMessages.tsx")

pytestmark = pytest.mark.skipif(not TSX.exists(),
                                reason="reference client not present")


def parse_tsx_schema():
    """interface Name { type: 'Name'; field: ts_type; ... } -> dict."""
    text = TSX.read_text()
    schema = {}
    for match in re.finditer(
            r"interface (\w+) \{(.*?)\n\}", text, re.S):
        name, body = match.groups()
        # strip the multiline matrix tuple to one line
        body = re.sub(r"\[\s*([^\]]*?)\s*\]", lambda g: "[" +
                      " ".join(g.group(1).split()) + "]", body, flags=re.S)
        fields = []
        for line in body.splitlines():
            line = line.strip().rstrip(";")
            if not line or line.startswith("//"):
                continue
            fm = re.match(r"(\w+)\s*:\s*(.+)", line)
            if fm:
                fields.append(fm.group(1))
        assert fields and fields[0] == "type"
        schema[name] = fields[1:]
    return schema


def test_every_client_message_exists_with_matching_fields():
    schema = parse_tsx_schema()
    assert len(schema) >= 23
    for name, fields in schema.items():
        cls = getattr(m, name, None)
        assert cls is not None, f"client message {name} missing in registry"
        import dataclasses
        ours = [f.name for f in dataclasses.fields(cls)]
        assert ours == fields, (
            f"{name}: field mismatch ours={ours} client={fields}")


def test_serialized_bytes_decode_to_client_shape():
    """Our wire bytes must decode (strict msgpack) into the flat map with
    a 'type' tag the client's handleMessage switch expects."""
    msgpack = pytest.importorskip("msgpack")
    msg = m.CameraMessage(
        aspect=1.5, render_aspect=1.5, fov=50.0,
        matrix=tuple(np.eye(4).T.flatten().tolist()),
        camera_type="perspective", is_moving=True, timestamp=123,
        xs=[0.25], ys=[0.75])
    raw = msg.serialize()
    decoded = msgpack.unpackb(raw)
    assert decoded["type"] == "CameraMessage"
    schema = parse_tsx_schema()
    assert set(decoded.keys()) == {"type", *schema["CameraMessage"]}
    assert decoded["is_moving"] is True and len(decoded["matrix"]) == 16

    bg = m.BackgroundImageMessage(media_type="image/jpeg", base64_data="abc")
    d2 = msgpack.unpackb(bg.serialize())
    assert d2 == {"type": "BackgroundImageMessage",
                  "media_type": "image/jpeg", "base64_data": "abc"}

    crop = m.CropParamsMessage(crop_enabled=True, crop_bg_color=(1, 2, 3),
                               crop_center=(0.0, 0.0, 0.0),
                               crop_scale=(2.0, 2.0, 2.0))
    d3 = msgpack.unpackb(crop.serialize())
    assert set(d3.keys()) == {"type", *schema["CropParamsMessage"]}


def test_client_bundle_present_and_speaks_the_protocol():
    """The shipped HTML client must reference every message type it
    handles/sends by the exact wire name."""
    client = Path(__file__).resolve().parents[1] / (
        "samnerf_tpu/viewer/client/index.html")
    assert client.exists()
    text = client.read_text()
    for required in ("BackgroundImageMessage", "GuiAddMessage",
                     "GuiUpdateMessage", "GuiSetHiddenMessage",
                     "GuiSetValueMessage", "CameraMessage",
                     "CropParamsMessage", "StatusMessage", "FPSMessage",
                     "ClearSamPinsMessage"):
        assert required in text, required
    # camera message carries the SAM pins exactly like the React client
    assert "xs: state.xs" in text and "ys: state.ys" in text


def _look_at_matrix(eye, target, up):
    """Python replica of the HTML client's lookAtMatrix (column-major,
    three.js conventions) for validating the server-side decoder."""
    eye = np.asarray(eye, np.float64)
    z = eye - np.asarray(target, np.float64)
    z /= np.linalg.norm(z)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.zeros(16)
    m[0:3] = x
    m[4:7] = y
    m[8:11] = z
    m[12:15] = eye
    m[15] = 1.0
    return m.tolist()


def test_client_camera_matrix_roundtrip():
    """A camera pose built the way the HTML client builds it must decode
    on the server into a c2w whose position/viewing direction match
    (camera_from_message applies the three.js y-up -> z-up swaps,
    ``render_state_machine.py:158-165``)."""
    from samnerf_tpu.viewer.render_state_machine import camera_from_message

    eye = [0.0, 0.0, 3.0]  # y-up world, camera on +z axis looking at origin
    msg = m.CameraMessage(
        aspect=1.0, render_aspect=1.0, fov=60.0,
        matrix=tuple(_look_at_matrix(eye, [0, 0, 0], [0, 1, 0])),
        camera_type="perspective", is_moving=False, timestamp=0,
        xs=[], ys=[])
    intrin, c2w = camera_from_message(msg, 64, 64)
    # position present (server swaps y/z axes: client y-up -> world z-up)
    np.testing.assert_allclose(sorted(np.abs(c2w[:, 3])), [0, 0, 3],
                               atol=1e-6)
    # viewing direction: central ray (camera -z) points back at the origin
    d = -c2w[:3, 2]
    np.testing.assert_allclose(c2w[:, 3] + 3.0 * d, [0, 0, 0], atol=1e-5)
    assert intrin[0, 0] == intrin[1, 1] > 0


def test_serve_client_http():
    """serve_client must deliver the bundled client over HTTP."""
    import urllib.request

    from samnerf_tpu.viewer.server import serve_client

    serve_client(http_port=17940, ws_port=17941, host="127.0.0.1")
    body = urllib.request.urlopen(
        "http://127.0.0.1:17940/", timeout=10).read().decode()
    assert "samnerf-tpu viewer" in body and "CameraMessage" in body

def test_client_emits_search_and_camera_path_messages():
    """Round-3 client features: search box (SearchTextMessage with
    switch_to_heat_map), camera-path recorder (CameraPathPayloadMessage),
    dataset frusta (DatasetImageMessage handling)."""
    client = Path(__file__).resolve().parents[1] / (
        "samnerf_tpu/viewer/client/index.html")
    text = client.read_text()
    for required in ("SearchTextMessage", "switch_to_heat_map",
                     "CameraPathPayloadMessage", "camera_path_filename",
                     "DatasetImageMessage", "camera_to_world",
                     "render_height", "render_width"):
        assert required in text, required


def test_dataset_image_message_round_trip():
    """DatasetImageMessage (frusta + thumbnail payload) survives the wire
    with the reference's to_json key set (cameras.py:728-761)."""
    from samnerf_tpu.core.cameras import Cameras
    import jax.numpy as jnp

    from samnerf_tpu.viewer.viewer_state import _camera_to_json

    cams = Cameras(
        camera_to_worlds=jnp.eye(4)[None, :3, :4],
        fx=jnp.asarray([[100.0]]), fy=jnp.asarray([[100.0]]),
        cx=jnp.asarray([[32.0]]), cy=jnp.asarray([[32.0]]),
        width=64, height=64)
    img = (np.arange(64 * 64 * 3) % 255).reshape(64, 64, 3).astype(np.uint8)
    j = _camera_to_json(cams, 0, img)
    for k in ("type", "cx", "cy", "fx", "fy", "camera_to_world",
              "camera_index", "times", "image"):
        assert k in j, k
    assert j["image"].startswith("data:image/jpeg;base64,")
    assert np.asarray(j["camera_to_world"]).shape == (3, 4)
    msg = m.DatasetImageMessage(idx="000000", json=j)
    back = m.Message.deserialize(msg.serialize())
    assert back.idx == "000000"
    assert back.json["camera_index"] == 0
    np.testing.assert_allclose(back.json["camera_to_world"],
                               j["camera_to_world"])


def test_camera_path_payload_saves_and_renders(tmp_path):
    """A client-exported camera path payload must save server-side and
    load through get_path_from_json into renderable Cameras (the
    render.py --traj contract)."""
    import json

    from samnerf_tpu.core.camera_paths import get_path_from_json
    from samnerf_tpu.viewer.viewer_state import ViewerState

    # build the client's kfBuildJson() shape: row-major 4x4 c2w + fov
    frames = []
    for ang in (0.0, 0.5, 1.0):
        eye = np.array([3 * np.sin(ang), 1.0, 3 * np.cos(ang)])
        mm = np.asarray(_look_at_matrix(eye, [0, 0, 0], [0, 1, 0]))
        c2w_rows = mm.reshape(4, 4).T.reshape(-1).tolist()
        frames.append({"camera_to_world": c2w_rows, "fov": 50.0,
                       "aspect": 1.0})
    payload = {"camera_type": "perspective", "render_height": 64,
               "render_width": 64, "camera_path": frames, "fps": 24,
               "seconds": 1, "smoothness_value": 0.5, "is_cycle": False,
               "crop": None}

    state = ViewerState.__new__(ViewerState)   # handler only; no sockets
    state.camera_paths_dir = str(tmp_path)
    state._handle_camera_path_payload(
        m.CameraPathPayloadMessage(camera_path_filename="loop",
                                   camera_path=payload))
    saved = json.loads((tmp_path / "loop.json").read_text())
    cams = get_path_from_json(saved)
    assert cams.num_cameras == 3
    # first pose: camera at [0, 1, 3] in the exported convention
    np.testing.assert_allclose(
        np.asarray(cams.camera_to_worlds)[0][:, 3], [0, 1, 3], atol=1e-6)

    # options request round-trips the saved path back to clients
    sent = []
    state.server = type("S", (), {"broadcast": lambda s, x: sent.append(x)})()
    state._handle_camera_path_options(m.CameraPathOptionsRequest())
    assert sent and "loop.json" in sent[0].payload
