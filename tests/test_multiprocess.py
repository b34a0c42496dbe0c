"""REAL 2-process execution of the distributed stack (VERDICT r4 #5).

Spawns two OS processes (localhost TCP rendezvous, 4 virtual CPU devices
each) running scripts/multiprocess_worker.py — the real run_rpn driver
end to end: per-process batch_iterator sharding, global-array assembly,
cross-process gradient psums in the jitted train step, rank-0-only orbax
checkpointing, and checkpoint restore on BOTH ranks.

This is the seam the mocked tests in test_multidevice.py cannot cover
(orbax saves of non-addressable arrays, make_array_from_process_local_data,
the eval path's process-local mesh).  ~3-5 min on a single CPU core.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_scenes(data_dir, n=8):
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        name = f"scene{i}"
        vol = np.zeros((32, 32, 32, 4), np.float32)
        lo = rng.integers(2, 16, 3)
        hi = lo + rng.integers(6, 12, 3)
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1.0
        np.savez(os.path.join(data_dir, f"{name}.npz"), rgbsigma=vol)
        np.save(os.path.join(data_dir, f"{name}.npy"),
                np.asarray([[*lo, *hi]], np.float32))
        names.append(name)
    np.savez(os.path.join(data_dir, "split.npz"),
             train_scenes=np.array(names[:6]),
             val_scenes=np.array(names[6:7]),
             test_scenes=np.array(names[7:]))


def test_two_process_train_checkpoint_restore(tmp_path):
    data_dir = tmp_path / "data"
    save = tmp_path / "out"
    data_dir.mkdir()
    _make_scenes(str(data_dir))

    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(repo, "scripts", "multiprocess_worker.py"),
             "--process-id", str(pid), "--num-processes", "2",
             "--coordinator", f"localhost:{port}",
             "--data-dir", str(data_dir), "--save-path", str(save)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1100)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"

    ranks = []
    for pid in range(2):
        with open(save / f"rank{pid}.json") as f:
            ranks.append(json.load(f))
    for r in ranks:
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
        assert r["finite"]
        assert r["restored_param_norm"] > 0
    # both ranks restored the SAME rank-0 checkpoint
    assert ranks[0]["restored_param_norm"] == ranks[1]["restored_param_norm"]
    # rank-0-only artifacts exist
    assert (save / "model_best").exists()
    assert (save / "epoch_1").exists()
