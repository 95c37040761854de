"""Two-process jax.distributed smoke test (SURVEY.md §5 distributed
backend; VERDICT r2 item 10): parallel/distributed.initialize via BOTH the
env-var path and the explicit-arg path, on the CPU backend with a
localhost coordinator. Single-host no-op behaviour is asserted in-process.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from rrin_tpu.parallel.distributed import DistributedContext, initialize

_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    mode = sys.argv[1]
    coord = sys.argv[2]
    pid = int(sys.argv[3])

    from rrin_tpu.parallel.distributed import initialize
    if mode == "env":
        os.environ["JAX_COORDINATOR_ADDRESS"] = coord
        os.environ["JAX_NUM_PROCESSES"] = "2"
        os.environ["JAX_PROCESS_ID"] = str(pid)
        ctx = initialize()
    else:
        ctx = initialize(
            coordinator_address=coord, num_processes=2, process_id=pid
        )
    assert ctx.initialized, ctx
    assert ctx.process_count == 2, ctx
    assert ctx.process_index == pid, ctx
    assert ctx.global_device_count == 2 * ctx.local_device_count, ctx
    print(f"worker {pid} OK: {ctx}")
    jax.distributed.shutdown()
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(mode: str, tmp_path) -> None:
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith("JAX_") and k != "XLA_FLAGS"
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), mode, coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    for i in range(2):
        assert f"worker {i} OK" in outs[i]


@pytest.mark.slow
class TestTwoProcess:
    def test_env_var_path(self, tmp_path):
        _run_two_process("env", tmp_path)

    def test_explicit_args_path(self, tmp_path):
        _run_two_process("args", tmp_path)


class TestSingleHostNoop:
    def test_noop_without_config(self):
        ctx = initialize()
        assert isinstance(ctx, DistributedContext)
        assert not ctx.initialized
        assert ctx.process_count >= 1
        assert ctx.local_device_count >= 1
