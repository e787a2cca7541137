"""Simulated multi-host bring-up: two real OS processes, each with one CPU
device, joined through jax.distributed via the framework's env-var
contract (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID →
parallel.mesh.maybe_initialize_distributed).  Verifies the global device
view, a cross-process psum, and PrefetchLoader's per-host index striding —
the configuration a TPU-pod launch runs, minus the chips.

(Also pins the ordering bug this test caught: calling jax.process_count()
before jax.distributed.initialize() initializes the XLA backend and makes
distributed bring-up impossible.)"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, "@REPO@")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from anystereo_tpu.parallel.mesh import maybe_initialize_distributed

    assert maybe_initialize_distributed(require=True)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 1
    assert len(jax.devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    pid = jax.process_index()
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    local = np.full((1, 4), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sh, local, (2, 4))
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(garr)
    assert float(np.asarray(total)) == 12.0  # (1 + 2) * 4 across processes

    from anystereo_tpu.data.loader import PrefetchLoader

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            return dict(i=np.asarray([i]))

    ld = PrefetchLoader(_DS(), 1, shuffle=False)
    assert ld.host_index == pid and ld.host_count == 2
    idx = ld._epoch_indices(0)
    assert (idx == np.arange(8)[pid::2]).all(), idx
    print("proc", pid, "OK", flush=True)
    """
)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class TestTwoProcessBringup:
    def test_psum_and_loader_sharding(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = tmp_path / "worker.py"
        script.write_text(WORKER.replace("@REPO@", repo))
        port = _free_port()
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update(
                COORDINATOR_ADDRESS=f"localhost:{port}",
                NUM_PROCESSES="2",
                PROCESS_ID=str(pid),
            )
            # a worker must not inherit the 8-virtual-device flag the suite
            # runs under — each process owns exactly one CPU device
            env.pop("XLA_FLAGS", None)
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(script)],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                )
            )
        outputs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outputs.append(out.decode())
        for pid, (p, out) in enumerate(zip(procs, outputs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
            assert f"proc {pid} OK" in out
