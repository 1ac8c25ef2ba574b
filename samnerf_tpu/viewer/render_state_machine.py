"""Viewer render state machine.

Reference: ``nerfstudio/viewer/server/render_state_machine.py`` — states
low_move / low_static / high with the same transition table (:78-91),
dynamic resolution from measured rays/sec vs the 24 fps target (:321-359),
fixed-FPS override (:355-357), camera construction from the client message
(:153-186 + ``viewer/server/utils.py:48-105``), output -> base64 image
(:301-319).

TPU redesign: the reference interrupts mid-render with a ``sys.settrace``
line hook (:291-299) — incompatible with compiled execution.  Here each
frame is ONE jitted dispatch (``engine/eval_render.ImageRenderer``), so
"interruption" is simply dropping to the next queued action between
frames; low-res frames are a few ms, giving equivalent responsiveness.
Resolutions are bucketed to multiples of ``res_step`` to bound recompiles.
"""
from __future__ import annotations

import dataclasses
import threading
import time
from collections import deque
from typing import Dict, Optional, Tuple

import numpy as np

from samnerf_tpu.viewer import messages as m

RENDER_STATES = ("low_move", "low_static", "high")
RENDER_ACTIONS = ("rerender", "move", "static", "step")


def get_prompt_points(cam_msg: m.CameraMessage, image_height: int,
                      image_width: int) -> np.ndarray:
    """Normalized click coords -> pixel (x, y)
    (``render_state_machine.py:45-52``)."""
    xs = (np.array(cam_msg.xs) * image_width).astype(np.int32)
    ys = (np.array(cam_msg.ys) * image_height).astype(np.int32)
    return np.stack([xs, ys], axis=-1)


def three_js_perspective_camera_focal_length(fov: float, image_height: int):
    """``viewer/server/utils.py:48-61``."""
    if fov is None:
        return 50.0
    return (image_height / 2.0) / np.tan(fov * (np.pi / 180.0) / 2.0)


def camera_from_message(cam_msg: m.CameraMessage, image_height: int,
                        image_width: int) -> Tuple[np.ndarray, np.ndarray]:
    """(intrinsics [3,3], c2w [3,4]) from the three.js camera message
    (``utils.py:63-105`` + the row swap at ``render_state_machine.py:158-165``)."""
    focal = three_js_perspective_camera_focal_length(cam_msg.fov, image_height)
    intrin = np.array([[focal, 0, image_width / 2.0],
                       [0, focal, image_height / 2.0],
                       [0, 0, 1.0]], np.float32)
    mat = np.array(cam_msg.matrix, np.float32).reshape(4, 4).T  # column-major
    mat = mat[[0, 2, 1, 3], :]  # swap y/z rows (three.js y-up -> z-up)
    c2w = mat[:3, :]
    c2w = c2w[[0, 2, 1], :]  # render_state_machine.py:158-165
    return intrin, c2w


@dataclasses.dataclass
class RenderAction:
    """``render_state_machine.py:54-65``."""
    action: str
    cam_msg: Optional[m.CameraMessage]
    use_fixed_fps: bool = False


class RenderStateMachine(threading.Thread):
    """Background thread turning camera actions into rendered frames."""

    def __init__(self, viewer_state, target_fps: int = 24,
                 res_step: int = 32):
        super().__init__(daemon=True)
        self.transitions = {s: {a: s for a in RENDER_ACTIONS}
                            for s in RENDER_STATES}
        self.transitions["low_move"]["static"] = "low_static"
        self.transitions["low_static"]["static"] = "high"
        self.transitions["low_static"]["step"] = "high"
        self.transitions["low_static"]["move"] = "low_move"
        self.transitions["high"]["move"] = "low_move"
        self.transitions["high"]["rerender"] = "low_static"
        self.state = "low_static"
        self.next_action: Optional[RenderAction] = None
        self.render_trigger = threading.Event()
        self.target_fps = target_fps
        self.res_step = res_step
        self.viewer = viewer_state
        self.last_cam_msg: Optional[m.CameraMessage] = None
        self.render_times = deque([], maxlen=3)
        self.vis_rays_per_sec = 100000.0  # initial guess (ref :342)
        # NB: must not be named ``_stop`` — that shadows an internal
        # threading.Thread method and corrupts thread teardown (the
        # source of the 'exception not rethrown' exit crashes).
        self._stop_requested = False

    def action(self, action: RenderAction):
        """``render_state_machine.py:102-133`` (sans the interrupt hack)."""
        if self.next_action is None:
            self.next_action = action
        elif action.action == "step" and (
                self.state == "low_move" or
                self.next_action.action in ("move", "static", "rerender")):
            return
        elif self.next_action.action == "rerender":
            pass  # never overwrite rerenders
        else:
            self.next_action = action
        self.render_trigger.set()

    def stop(self):
        self._stop_requested = True
        self.render_trigger.set()

    def run(self):
        while not self._stop_requested:
            self.render_trigger.wait(timeout=0.1)
            if self._stop_requested:
                return
            action = self.next_action
            self.render_trigger.clear()
            self.next_action = None
            if action is None:
                continue
            if action.cam_msg is None and self.last_cam_msg is None:
                continue
            self.state = self.transitions[self.state][action.action]
            try:
                outputs, res = self._render_img(action)
                if self._stop_requested:
                    return
                self._send_output_to_viewer(outputs, res)
            except Exception:  # keep the loop alive (ref :281-283)
                # A stop() whose join timed out mid-render leaves this
                # daemon thread racing interpreter teardown — the render
                # then dies on torn-down jit caches (KeyError on a
                # tracer Var); that's shutdown, not an error to report.
                import sys
                if self._stop_requested or sys.is_finalizing():
                    return
                import traceback
                traceback.print_exc()
            if self.state == "low_static":
                # self-trigger upgrade to high (ref :287-288)
                self.action(RenderAction("static", self.last_cam_msg))

    def _calculate_image_res(self, aspect_ratio: float) -> Tuple[int, int]:
        """``render_state_machine.py:321-359``, bucketed to res_step."""
        max_res = self.viewer.max_res
        if self.state == "high":
            image_height = max_res
            image_width = int(image_height * aspect_ratio)
            if image_width > max_res:
                image_width = max_res
                image_height = int(image_width / aspect_ratio)
        else:
            num_vis_rays = self.vis_rays_per_sec / self.target_fps
            image_height = int((num_vis_rays / aspect_ratio) ** 0.5)
            image_height = max(min(max_res, image_height), 30)
            image_width = int(image_height * aspect_ratio)
            if image_width > max_res:
                image_width = max_res
                image_height = int(image_width / aspect_ratio)
        if self.viewer.use_fixed_fps:
            image_height = max_res
            image_width = int(image_height * aspect_ratio)
        # bucket to bound jit recompiles
        step = self.res_step
        image_height = max(step, (image_height // step) * step)
        image_width = max(step, (image_width // step) * step)
        return image_height, image_width

    def _render_img(self, action: RenderAction):
        """``render_state_machine.py:135-243``."""
        cam_msg = action.cam_msg if action.cam_msg is not None else self.last_cam_msg
        self.last_cam_msg = cam_msg
        v = self.viewer
        h, w = self._calculate_image_res(cam_msg.aspect)
        intrin, c2w = camera_from_message(cam_msg, h, w)

        points = None
        text_prompt = None
        threshold, topk = 0.0, 0
        if v.use_sam:
            points = get_prompt_points(cam_msg, h, w)
        if v.use_text_prompt:
            text_prompt, threshold, topk = v.text_prompt, v.threshold, int(v.topk)
        if v.use_search_text:
            text_prompt, points = v.search_text, None
            threshold, topk = v.threshold, int(v.topk)

        t0 = time.time()
        # moving camera -> reduced-sample "move" preset (the reference
        # degrades resolution during motion, render_state_machine.py:321-359;
        # on TPU halved sample counts compose with that)
        preset = "move" if self.state == "low_move" else "static"
        with v.train_lock if v.train_lock is not None else _null():
            outputs = v.render_view(intrin, c2w, h, w, points=points,
                                    text_prompt=text_prompt, topk=topk,
                                    thresh=threshold, preset=preset)
        dt = max(time.time() - t0, 1e-6)
        self.render_times.append(dt)
        self.vis_rays_per_sec = 0.8 * self.vis_rays_per_sec + 0.2 * (h * w / dt)
        v.server.send_status_message(eval_res=f"{h}x{w}px", step=v.step)
        return outputs, (h, w)

    def _send_output_to_viewer(self, outputs: Dict[str, np.ndarray], res):
        """``render_state_machine.py:301-319``."""
        v = self.viewer
        key = v.output_render if v.output_render in outputs else "rgb"
        img = outputs[key]
        if img.shape[-1] == 1:
            from samnerf_tpu.utils.colormaps import apply_colormap
            img = apply_colormap(img)
        img_u8 = (np.clip(np.asarray(img, np.float32), 0, 1) * 255).astype(np.uint8)
        v.server.set_background_image(img_u8, file_format="jpeg")
        if self.render_times:
            v.server.update_fps(1.0 / np.mean(self.render_times))


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
