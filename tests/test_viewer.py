"""Network-GUI protocol: loopback round-trip with a fake SIBR client."""

import json
import socket
import threading

import numpy as np


def test_network_gui_roundtrip():
    from radegs_tpu.viewer.network_gui import NetworkGUI

    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    H, W = 24, 32
    # the torch-side transposed world_view with y/z columns negated (what
    # the SIBR client sends, network_gui.py:73-76)
    wv_ours = np.eye(4, dtype=np.float32)  # identity w2c
    wv_torch = wv_ours.T.copy()
    wv_torch[:, 1] *= -1
    wv_torch[:, 2] *= -1
    msg = {
        "resolution_x": W, "resolution_y": H, "train": True,
        "fov_y": 0.8, "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": wv_torch.reshape(-1).tolist(),
        "view_projection_matrix": np.eye(4).reshape(-1).tolist(),
    }
    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < H * W * 3:
            img += s.recv(H * W * 3 - len(img))
        n = int.from_bytes(s.recv(4), "little")
        verify = s.recv(n).decode()
        received["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        received["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()

    calls = {}

    def render_fn(cam, scale_mod):
        calls["cam"] = cam
        calls["scale"] = scale_mod
        img = np.zeros((3, H, W), np.float32)
        img[0] = 0.5  # red 127/128
        return img

    gui.try_connect()
    while gui.conn is None:
        gui.try_connect()
    do_training = gui.poll(render_fn, "srcpath", training_done=False)
    t.join(timeout=5)

    assert do_training is True
    assert received["verify"] == "srcpath"
    assert received["img"][..., 0].min() >= 126 and received["img"][..., 1].max() == 0
    cam = calls["cam"]
    assert cam.width == W and cam.height == H
    # identity pose round-trips through the transpose/flip convention
    np.testing.assert_allclose(np.asarray(cam.world_view), np.eye(4), atol=1e-6)
    gui.drop()
