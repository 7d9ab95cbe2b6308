"""Real 2-process multi-host smoke tests (VERDICT r1 item 4).

Each test launches TWO separate python processes that bring up
``jax.distributed`` over local TCP (CPU backend, 2 virtual devices per
process -> 4 global devices) and run the actual CLI entry points. This
exercises the paths unit tests with faked indices cannot: the Gloo
collective bring-up, exp-dir broadcast, cross-process batch assembly
(``make_array_from_process_local_data``), collective Orbax save, and the
per-host eval journal shards.

TPU-pod equivalence: on a real pod the same code path runs with
``jax.distributed.initialize()`` auto-detecting the cluster; here the
coordinator is passed explicitly via ``mesh.coordinator`` config — the same
wiring a manual cluster would use.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(worker_src: str, tmp_path, n_procs: int = 2,
                 timeout: int = 600):
    """Run worker_src (a python module text) in n_procs processes."""
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        # Suppress the image's remote-TPU handshake in child interpreters.
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=REPO,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    return outs


COMMON_HEADER = """
import os, sys
from jpdvt_mt_ntnu_tpu.utils.platform import ensure_platform
ensure_platform()
pid, port = int(sys.argv[1]), sys.argv[2]
"""


@pytest.mark.slow
def test_multihost_train_cli(tmp_path):
    """run_train.main on 2 processes: distributed bring-up via config,
    exp-dir broadcast, global batch assembly, collective final save."""
    worker = COMMON_HEADER + textwrap.dedent("""
        from jpdvt_mt_ntnu_tpu.train.run_train import main
        rc = main([
            f"mesh.coordinator=localhost:{port}",
            "mesh.num_processes=2", f"mesh.process_id={pid}",
            "data.dataset=synthetic", "data.global_batch_size=8",
            "data.num_workers=2", "data.synthetic_n=32",
            "model.image_size=48", "model.depth=1", "model.hidden_size=32",
            "model.num_heads=2", "model.attn_impl=xla",
            "model.compute_dtype=float32",
            "train.epochs=1", "train.log_every=2",
            "train.ckpt_every=1000000",
            "train.results_dir=results",
            "diffusion.sampling_steps=2", "diffusion.sampler_mode=fast",
        ])
        import jax
        assert jax.process_count() == 2, jax.process_count()
        assert len(jax.devices()) == 4, jax.devices()
        print(f"TRAIN_OK pid={pid} rc={rc}")
        assert rc == 0
    """)
    outs = _run_workers(worker, tmp_path)
    assert all("TRAIN_OK" in o for o in outs), outs

    # Host 0 created the experiment dir; the broadcast meant host 1 wrote
    # its checkpoint shards into the SAME directory.
    runs = os.listdir(tmp_path / "results")
    assert len(runs) == 1, runs
    exp = tmp_path / "results" / runs[0]
    assert (exp / "checkpoints").exists()
    metrics = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    assert any("train_loss" in m for m in metrics)
    assert any("val_puzzle_acc" in str(m) for m in metrics)


@pytest.mark.slow
def test_multihost_eval_journal_merge(tmp_path):
    """2-process sharded eval: each host solves its strided slice, writes a
    per-host journal shard, and the merged read sees every item exactly once
    (reference inference_ddp.py:325 + the rank-0 csv race it has)."""
    worker = COMMON_HEADER + textwrap.dedent("""
        import jax
        jax.distributed.initialize(f"localhost:{port}", 2, pid)
        from jpdvt_mt_ntnu_tpu.parallel import process_shard
        from jpdvt_mt_ntnu_tpu.eval.journal import ProgressJournal

        items = [f"img_{i:03d}.jpg" for i in range(11)]
        mine = process_shard(items)
        expected = items[pid::2]
        assert mine == expected, (mine, expected)
        j = ProgressJournal("logs", host_index=jax.process_index())
        for name in mine:
            j.append(name, 1, 9, 0.5)
        j.close()
        print(f"EVAL_OK pid={pid} n={len(mine)}")
    """)
    outs = _run_workers(worker, tmp_path)
    assert all("EVAL_OK" in o for o in outs), outs

    from jpdvt_mt_ntnu_tpu.eval.journal import ProgressJournal

    state = ProgressJournal(str(tmp_path / "logs")).load()
    assert state.count == 11
    assert len(state.processed) == 11
    assert state.puzzle_correct == 11 and state.patch_matches == 99
