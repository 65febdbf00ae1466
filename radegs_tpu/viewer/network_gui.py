"""SIBR remote-viewer bridge speaking the reference's network_gui protocol
(gaussian_renderer/network_gui.py:26-85), so the existing SIBR
``remoteGaussianUI`` app works unmodified against the TPU renderer.

Wire format: client sends <u32 LE length><json>; the JSON carries
resolution, fovs, near/far, train/keep-alive flags, scaling modifier and the
(transposed, y/z-flipped) view + view-projection matrices. Server replies
with raw H*W*3 uint8 RGB followed by <u32 LE length><verify string>.
"""

from __future__ import annotations

import json
import socket

import numpy as np

from radegs_tpu.core.camera import Camera


class NetworkGUI:
    def __init__(self, host="127.0.0.1", port=6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def try_connect(self):
        if self.conn is not None:
            return
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nViewer connected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read_json(self):
        n = int.from_bytes(self._recv_exact(4), "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def receive(self):
        """-> (Camera | None, do_training, keep_alive, scaling_modifier).

        None camera = empty resolution handshake (network_gui.py:84-85).
        """
        msg = self._read_json()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None
        wv = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wv[:, 1] *= -1
        wv[:, 2] *= -1
        # incoming matrix is the torch/glm transposed world_view: ours = wv.T
        w2c = wv.T
        R = w2c[:3, :3].T  # c2w rotation
        T = w2c[:3, 3]
        cam = Camera.create(
            R, T, msg["fov_x"], msg["fov_y"], width, height,
            znear=msg["z_near"], zfar=msg["z_far"],
        )
        return cam, bool(msg["train"]), bool(msg["keep_alive"]), msg["scaling_modifier"]

    def send_image(self, image_chw, verify: str):
        """image: (3,H,W) float in [0,1] or None; verify: source-path string."""
        payload = None
        if image_chw is not None:
            arr = np.asarray(image_chw)
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
            payload = memoryview(np.ascontiguousarray(arr)).cast("B")
        if payload is not None:
            self.conn.sendall(payload)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def drop(self):
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
            self.conn = None

    def poll(self, render_fn, source_path: str, training_done: bool):
        """One training-loop poll (train.py:92-105): serve frames while
        connected; returns do_training (False only if viewer paused it)."""
        self.try_connect()
        do_training = True
        while self.conn is not None:
            try:
                cam, train_flag, keep_alive, scale_mod = self.receive()
                img = None
                if cam is not None:
                    img = render_fn(cam, scale_mod)
                self.send_image(img, source_path)
                if train_flag is not None:
                    do_training = train_flag
                if do_training and (not keep_alive or training_done):
                    break
            except Exception:
                self.drop()
        return do_training
