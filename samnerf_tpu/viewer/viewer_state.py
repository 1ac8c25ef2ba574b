"""ViewerState: websocket server + SAM/text/search state + render machine.

Reference: ``nerfstudio/viewer/server/viewer_state.py:71-481`` — owns the
server, registers the message handlers (:151-163), tracks the SAM / text /
search / fixed-fps flags (:120-139), turns camera updates into state-machine
actions (:283-299), and draws the scene (camera frusta + aabb) on init
(:397-423).  Train-step throttling (:438-458) is handled by the trainer's
cooperative ``step_callback``.
"""
from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np

from samnerf_tpu.viewer import messages as m
from samnerf_tpu.viewer.render_state_machine import (RenderAction,
                                                     RenderStateMachine)
from samnerf_tpu.viewer.server import ViewerServer


def _camera_to_json(cameras, idx: int, image=None, max_size: int = 100):
    """One training camera as the reference's ``Cameras.to_json`` dict
    (``nerfstudio/cameras/cameras.py:728-761``): intrinsics + 3x4
    camera_to_world + optional base64-jpeg thumbnail data-url."""
    d = {
        "type": "PinholeCamera",
        "cx": float(np.asarray(cameras.cx).reshape(-1)[idx]),
        "cy": float(np.asarray(cameras.cy).reshape(-1)[idx]),
        "fx": float(np.asarray(cameras.fx).reshape(-1)[idx]),
        "fy": float(np.asarray(cameras.fy).reshape(-1)[idx]),
        "camera_to_world":
            np.asarray(cameras.camera_to_worlds)[idx].tolist(),
        "camera_index": idx,
        "times": None,
    }
    if image is not None:
        import base64
        import io

        from PIL import Image
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        pil = Image.fromarray(img)
        s = max_size / max(pil.size)
        if s < 1:
            pil = pil.resize((max(int(pil.size[0] * s), 1),
                              max(int(pil.size[1] * s), 1)))
        buf = io.BytesIO()
        pil.save(buf, format="JPEG", quality=75)
        d["image"] = ("data:image/jpeg;base64,"
                      + base64.b64encode(buf.getvalue()).decode("ascii"))
    return d


class ViewerState:
    def __init__(self, renderer, params_fn, cameras,
                 host: str = "0.0.0.0", port: int = 7007,
                 train_lock: Optional[threading.Lock] = None,
                 max_res: int = 512,
                 save_checkpoint_fn=None):
        """Args:
            renderer: engine.render_pipeline.SamNerfRenderer.
            params_fn: () -> current model params (live training weights).
            cameras: Cameras pytree used for scene display.
        """
        self.renderer = renderer
        self.params_fn = params_fn
        self.cameras = cameras
        self.server = ViewerServer(host=host, port=port)
        self.train_lock = train_lock
        self.save_checkpoint_fn = save_checkpoint_fn

        # interactive state (viewer_state.py:120-139)
        self.use_sam = False
        self.use_text_prompt = False
        self.use_search_text = False
        self.use_fixed_fps = False
        self.text_prompt = ""
        self.search_text = ""
        self.threshold = 0.5
        self.topk = 5
        self.n_points_sam = 0
        self.output_render = "rgb"
        self.max_res = max_res
        self.step = 0
        self.training_state = "training"
        self.camera_moving = False
        # viewer crop box (reference viewer_state.py crop handling +
        # control_panel.py:83-90)
        self.crop_enabled = False
        self.crop_min = np.array([-1.0, -1.0, -1.0], np.float32)
        self.crop_max = np.array([1.0, 1.0, 1.0], np.float32)
        self.crop_bg = np.array([38, 42, 55], np.float32) / 255.0

        self.render_machine = RenderStateMachine(self)

        # handlers (viewer_state.py:151-163 + sam handlers :223-268)
        s = self.server
        s.register_handler(m.CameraMessage, self._handle_camera_update)
        s.register_handler(m.SamMessage, self._sam_update)
        s.register_handler(m.ClearSamPinsMessage, self._clear_sam_pins)
        s.register_handler(m.TextPromptMessage, self._send_text_prompt)
        s.register_handler(m.ThresholdMessage, self._handle_threshold)
        s.register_handler(m.FPSMessage, self._handle_fps)
        s.register_handler(m.SearchTextMessage, self._handle_search_text)
        s.register_handler(m.TrainingStateMessage, self._handle_training_state)
        s.register_handler(m.SaveCheckpointMessage, self._handle_save_ckpt)
        s.register_handler(m.CropParamsMessage, self._handle_crop_params)
        s.register_handler(m.CameraPathPayloadMessage,
                           self._handle_camera_path_payload)
        s.register_handler(m.CameraPathOptionsRequest,
                           self._handle_camera_path_options)
        # client "save camera path" target (reference writes to
        # datapath/camera_paths, viewer_state.py:301-320)
        self.camera_paths_dir = None

        # server-declared GUI (reference control_panel.py:96-141) wired to
        # the interactive state
        from samnerf_tpu.viewer.control_panel import ControlPanel
        self.control_panel = ControlPanel(s, rerender_cb=self._rerender)
        p = self.control_panel
        p.on("Enable SAM", lambda v: self._sam_update(m.SamMessage(bool(v))))
        p.on("Clear SAM pins",
             lambda v: self._clear_sam_pins(m.ClearSamPinsMessage()))
        p.on("Send", lambda v: self._send_text_prompt(
            m.TextPromptMessage(p["Text Prompt"])))
        p.on("Clear",
             lambda v: self._send_text_prompt(m.TextPromptMessage("")))
        p.on("Threshold", lambda v: setattr(self, "threshold", float(v)))
        p.on("TopK", lambda v: setattr(self, "topk", int(v)))
        p.on("Output Render", lambda v: setattr(self, "output_render", v))
        p.on("Max Res", lambda v: setattr(self, "max_res", int(v)))
        p.on("Crop Viewport", self._panel_crop_update)
        p.on("Crop Min", self._panel_crop_update)
        p.on("Crop Max", self._panel_crop_update)
        p.on("Background color", self._panel_crop_update)

    def start(self):
        self.server.start()
        self.render_machine.start()
        # daemon threads must not outlive the interpreter's teardown of
        # jit machinery (stray KeyError tracebacks / native 'exception
        # not rethrown' after green test runs); stop() is idempotent
        import atexit
        atexit.register(self.stop)

    def stop(self):
        """Stop the render thread and the websocket server; idempotent."""
        rm = getattr(self, "render_machine", None)
        if rm is not None and rm.is_alive():
            rm.stop()
            rm.join(timeout=5)
        srv = getattr(self, "server", None)
        if srv is not None:
            srv.stop()

    # --- model access for the render machine -------------------------------
    def render_view(self, intrin, c2w, h, w, points=None, text_prompt=None,
                    topk=5, thresh=0.5,
                    preset="static") -> Dict[str, np.ndarray]:
        from samnerf_tpu.engine.render_pipeline import cameras_from_intrin_c2w
        cam = cameras_from_intrin_c2w(intrin, c2w, h, w)
        crop_aabb = crop_bg = None
        if self.crop_enabled:
            crop_aabb = np.stack([self.crop_min, self.crop_max])
            crop_bg = self.crop_bg
        return self.renderer.render_view(
            self.params_fn(), cam, 0, intrin, c2w,
            points=points, text_prompt=text_prompt, topk=topk, thresh=thresh,
            width=w, height=h, crop_aabb=crop_aabb, crop_bg=crop_bg,
            preset=preset)

    # --- handlers -----------------------------------------------------------
    def _handle_camera_update(self, msg: m.CameraMessage):
        """``viewer_state.py:283-299``."""
        self.camera_moving = msg.is_moving
        n_pins = len(msg.xs)
        if self.use_sam and n_pins != self.n_points_sam:
            self.n_points_sam = n_pins
            self.render_machine.action(RenderAction("rerender", msg))
        elif msg.is_moving:
            self.render_machine.action(RenderAction("move", msg))
        else:
            self.render_machine.action(RenderAction("static", msg))

    def _sam_update(self, msg: m.SamMessage):
        self.use_sam = msg.use_sam
        if not msg.use_sam:
            self.renderer.clear_prompts()
            self.n_points_sam = 0
        self.render_machine.action(
            RenderAction("rerender", self.render_machine.last_cam_msg))

    def _clear_sam_pins(self, msg: m.ClearSamPinsMessage):
        self.renderer.clear_prompts()
        self.n_points_sam = 0
        self.server.clear_sam_pins()
        self.render_machine.action(
            RenderAction("rerender", self.render_machine.last_cam_msg))

    def _send_text_prompt(self, msg: m.TextPromptMessage):
        self.text_prompt = msg.text_prompt
        self.use_text_prompt = bool(msg.text_prompt)
        self.render_machine.action(
            RenderAction("rerender", self.render_machine.last_cam_msg))

    def _handle_threshold(self, msg: m.ThresholdMessage):
        self.threshold = msg.threshold

    def _handle_fps(self, msg: m.FPSMessage):
        self.use_fixed_fps = msg.fps > 0

    def _handle_search_text(self, msg: m.SearchTextMessage):
        self.search_text = msg.text
        self.use_search_text = bool(msg.text)
        self.output_render = ("clipseg_feature" if msg.switch_to_heat_map
                              else "rgb")
        self.render_machine.action(
            RenderAction("rerender", self.render_machine.last_cam_msg))

    def _handle_training_state(self, msg: m.TrainingStateMessage):
        self.training_state = msg.training_state

    def _handle_save_ckpt(self, msg: m.SaveCheckpointMessage):
        if self.save_checkpoint_fn is not None:
            self.save_checkpoint_fn(self.step)

    def _rerender(self):
        self.render_machine.action(
            RenderAction("rerender", self.render_machine.last_cam_msg))

    def _panel_crop_update(self, _value=None):
        """Panel crop edits -> crop state (reference crop_update_cb,
        ``control_panel.py:83-90``)."""
        p = self.control_panel
        self.crop_enabled = p.crop_viewport
        self.crop_min = np.asarray(p.crop_min, np.float32)
        self.crop_max = np.asarray(p.crop_max, np.float32)
        self.crop_bg = np.asarray(p.background_color, np.float32) / 255.0

    def _handle_crop_params(self, msg: m.CropParamsMessage):
        """Client crop edits (reference ``viewer_state.py`` crop handler):
        center/scale -> min/max corners."""
        self.crop_enabled = bool(msg.crop_enabled)
        center = np.asarray(msg.crop_center, np.float32)
        scale = np.asarray(msg.crop_scale, np.float32)
        self.crop_min = center - scale / 2.0
        self.crop_max = center + scale / 2.0
        self.crop_bg = np.asarray(msg.crop_bg_color, np.float32) / 255.0
        self.render_machine.action(
            RenderAction("rerender", self.render_machine.last_cam_msg))

    def _handle_camera_path_payload(self, msg: m.CameraPathPayloadMessage):
        """Persist a client-authored camera path
        (reference ``viewer_state.py:301-311``): written as
        ``camera_paths/<filename>.json``, consumable by
        ``scripts/render.py --traj``."""
        import json
        from pathlib import Path
        d = Path(self.camera_paths_dir or "/tmp/camera_paths")
        d.mkdir(parents=True, exist_ok=True)
        name = Path(str(msg.camera_path_filename)).name
        if not name.endswith(".json"):
            name += ".json"
        (d / name).write_text(json.dumps(msg.camera_path))

    def _handle_camera_path_options(self, msg: m.CameraPathOptionsRequest):
        """List saved camera paths back to the client
        (reference ``viewer_state.py:313-320``)."""
        import json
        from pathlib import Path
        d = Path(self.camera_paths_dir or "/tmp/camera_paths")
        payload = {}
        if d.exists():
            for p in sorted(d.glob("*.json")):
                try:
                    payload[p.name] = json.loads(p.read_text())
                except (OSError, json.JSONDecodeError):
                    continue
        self.server.broadcast(m.CameraPathsMessage(payload=payload))

    # --- training-loop integration ------------------------------------------
    def init_scene(self, aabb_min=(-1, -1, -1), aabb_max=(1, 1, 1),
                   cameras=None, images=None, max_display: int = 16,
                   config_base_dir: str = "", data_base_dir: str = "",
                   export_path_name: str = ""):
        """``viewer_state.py:397-423``: aabb + per-training-camera frusta
        with image thumbnails.

        Args:
            cameras: optional ``core.cameras.Cameras`` (training split).
            images: optional uint8 [N, H, W, 3] (or list) matching cameras.
            max_display: images drawn, evenly spaced (``:380-395``).
        """
        if config_base_dir or data_base_dir:
            self.server.send_file_path_info(config_base_dir, data_base_dir,
                                            export_path_name)
        if cameras is not None:
            n = int(cameras.num_cameras)
            idxs = np.linspace(0, n - 1, min(max_display, n), dtype=int)
            for i in np.unique(idxs):
                self.server.add_dataset_image(
                    f"{int(i):06d}",
                    _camera_to_json(cameras, int(i),
                                    None if images is None else images[i]))
        self.server.update_scene_box(aabb_min, aabb_max)
        self.server.set_training_state(self.training_state)

    def step_callback(self, step: int, metrics=None):
        """Called by the trainer each step; issues periodic re-renders
        (``trainer.py:250, 313-328``)."""
        self.step = step
        if step % 30 == 0 and self.render_machine.last_cam_msg is not None:
            self.render_machine.action(
                RenderAction("step", self.render_machine.last_cam_msg))
        while self.training_state == "paused":
            import time
            time.sleep(0.05)
