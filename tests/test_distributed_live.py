"""LIVE multi-process validation of the DCN layer (parallel/distributed.py).

Round-1 left §5.8 as unit tests only; here two real processes initialise
jax.distributed against a local coordinator, form the global device view,
run one cross-process collective (psum over all global devices), and agree
on a disjoint+complete folder-batch split — the actual multi-host contract
(SURVEY §5.8; the reference's analogue is the 4-process pool,
Solex_recon.py:30-42).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
import jax.numpy as jnp
from jax import lax

local = jax.local_device_count()
total = jax.device_count()
# one collective across ALL global devices: psum of ones == global count
out = jax.pmap(lambda x: lax.psum(x, "i"), axis_name="i")(
    np.ones(local, dtype=np.float32)
)
from solex_ser_recon_en_tpu.parallel.distributed import assign_files

files = [f"scan_{i:03d}.ser" for i in range(40)]
mine = assign_files(files, 2, pid)
print(json.dumps({
    "pid": pid,
    "local": local,
    "total": total,
    "psum": float(np.asarray(out)[0]),
    "mine": mine,
}))
"""


def test_two_process_distributed_psum_and_file_split(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed children timed out")
        if p.returncode != 0:
            if "DISTRIBUTED" in err.upper() or "coordinat" in err.lower():
                pytest.skip(f"jax.distributed unavailable here: {err[-300:]}")
            pytest.fail(f"child failed: {err[-800:]}")
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    # the children inherit whatever virtual-device count the environment
    # forces (conftest uses 8); assert the multi-process CONTRACT: the
    # global view is both processes' devices and the collective spans it
    local = by_pid[0]["local"]
    assert local >= 2
    assert by_pid[0]["total"] == by_pid[1]["total"] == 2 * local
    assert by_pid[0]["psum"] == by_pid[1]["psum"] == float(2 * local)
    mine0, mine1 = set(by_pid[0]["mine"]), set(by_pid[1]["mine"])
    assert mine0.isdisjoint(mine1)
    assert mine0 | mine1 == {f"scan_{i:03d}.ser" for i in range(40)}
