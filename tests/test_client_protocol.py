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
