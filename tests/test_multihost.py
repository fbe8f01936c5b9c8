"""Multi-controller (multi-host) training tests.

Simulates a 2-host pod on this machine: two OS processes, each with 4
virtual CPU devices, joined via jax.distributed + gloo collectives into one
global 8-device mesh. Both processes run the identical training program
(tests/_multihost_worker.py); the test asserts

  * both processes report the SAME losses (the SPMD program is coherent
    across controllers), and
  * those losses match a single-controller 8-device run of the same
    `run_losses` helper in this pytest session (the multi-host seam —
    parallel.multihost.put_with_sharding — changes where shards upload
    from, not the math), for both the streamed pipeline and the
    device-resident epoch cache.

The reference has no distributed execution at all (`main.py:9-14`, no
NCCL/MPI — SURVEY §2.4); this is the TPU-native scale-out path a real pod
deployment uses (multi-controller JAX, one process per host).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from avsync.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh_corpus"))
    synthetic.write_corpus(
        root, n_speakers=2, clips_per_speaker=8, preprocessed=True,
        n_frames=24, height=16, width=32, seed=11, with_audio=False,
    )
    return root


@pytest.fixture(scope="module")
def partial_corpus(tmp_path_factory):
    # 288 kB f32 clips so the worker's 1 MB budget caches 3 of 16 — the
    # PARTIAL-cache regime (prefix cached, remainder streams per epoch)
    root = str(tmp_path_factory.mktemp("mh_partial"))
    synthetic.write_corpus(
        root, n_speakers=2, clips_per_speaker=8, preprocessed=True,
        n_frames=24, height=48, width=64, seed=23, with_audio=False,
    )
    return root


@pytest.fixture(scope="module")
def worker_results(corpus, partial_corpus):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform via jax.config
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), corpus,
             partial_corpus],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err[-2000:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))
    return outs


class TestMultihost:
    def test_processes_agree(self, worker_results):
        a, b = worker_results
        assert a["devices"] == b["devices"] == 8
        assert a["stream"] == b["stream"]
        assert a["cache"] == b["cache"]
        assert a["scan"] == b["scan"]
        assert a["tp"] == b["tp"]

    def test_dp_tp_mesh_multihost(self, worker_results):
        """The (4,2) dp x tp mesh trains multi-controller: TP pairs inside a
        host, 'data' spanning hosts — losses match the DP-8 run (the sharded
        computation is the same math; gate columns merely split)."""
        a = worker_results[0]
        np.testing.assert_allclose(a["tp"], a["stream"], rtol=2e-4, atol=1e-5)

    def test_hierarchical_slice_mesh_multihost(self, worker_results):
        """The 2-level ('slice','data','model') mesh with one slice PER HOST
        — the real multi-slice/DCN layout — matches the flat DP-8 run."""
        a, b = worker_results
        assert a["slice"] == b["slice"]
        np.testing.assert_allclose(
            a["slice"], a["stream"], rtol=2e-4, atol=1e-5
        )

    def test_scan_epoch_and_checkpoint_roundtrip(self, worker_results, corpus):
        """Whole-epoch scanned training (one dispatch per epoch) works
        multi-controller, and an Orbax save/restore roundtrips exactly."""
        a, b = worker_results
        # the scanned program is the same math as the per-batch loop
        np.testing.assert_allclose(
            a["scan"], a["stream"], rtol=2e-4, atol=1e-5
        )
        assert a["ckpt_err"] == 0.0, a["ckpt_err"]
        assert b["ckpt_err"] == 0.0, b["ckpt_err"]

    @pytest.mark.parametrize("mode", ["stream", "cache"])
    def test_matches_single_controller(self, worker_results, corpus, mode):
        sys.path.insert(0, os.path.join(REPO, "tests"))
        try:
            import _multihost_worker as w
        finally:
            sys.path.pop(0)
        single = w.run_losses(corpus, mode)
        multi = worker_results[0][mode]
        assert len(single) == len(multi) == 2
        # gloo all-reduce may order the 2-process gradient reduction
        # differently from the single-process psum — tiny f32 tolerance
        np.testing.assert_allclose(multi, single, rtol=2e-4, atol=1e-5)

    def test_preemption_is_lockstep_across_processes(self, worker_results):
        """Only process 0 is SIGTERMed mid-run (worst-case skew on a dp x tp
        mesh); the cross-host vote must stop BOTH processes at the same
        epoch boundary and save the TP-sharded state without deadlock."""
        a, b = worker_results
        assert a["preempt"] == b["preempt"], (a["preempt"], b["preempt"])
        # signaled during epoch 2's example_fn -> both stop entering epoch 3
        assert a["preempt"]["epochs_run"] == 2
        assert a["preempt"]["ckpt_latest"] == 3
        assert a["preempt"]["preempted_meta"] == 1.0

    def test_cache_epoch2_matches_stream(self, worker_results):
        # within the multi-controller run, the cached pipeline must be
        # training the same model as the streamed one (same batches)
        a = worker_results[0]
        np.testing.assert_allclose(
            a["cache"], a["stream"], rtol=2e-4, atol=1e-5
        )

    def test_partial_cache_splits_decode_across_hosts(
        self, worker_results, partial_corpus
    ):
        """Partial cache multi-controller: both processes train the same
        model (losses agree and match a single-controller run), and each
        host decodes only the missed rows its OWN devices hold — not every
        miss in the batch (which would make partial-cache host work P times
        the streamed path's)."""
        a, b = worker_results
        assert a["partial"]["losses"] == b["partial"]["losses"]
        assert a["partial"]["n_cached"] == 3  # 1 MB // 288 kB f32
        sys.path.insert(0, os.path.join(REPO, "tests"))
        try:
            import _multihost_worker as w
        finally:
            sys.path.pop(0)
        single = w.run_partial_cache(partial_corpus)
        assert single["n_cached"] == 3
        np.testing.assert_allclose(
            a["partial"]["losses"], single["losses"], rtol=2e-4, atol=1e-5
        )
        # 16 clips, 3 cached, B=8 -> 2 batches/epoch, 13 misses/epoch.
        # Single-controller decodes ALL misses; each of the 2 hosts may
        # decode at most its 4 owned packed rows per batch (8/epoch) —
        # strictly fewer than the global miss count. A regression to
        # global decode would make each host match the single-controller
        # count. Epoch 0 is the streamed+cache-build epoch; assert on the
        # steady-state epochs 1-2.
        for r in (a, b):
            per_host = r["partial"]["epoch_decodes"][1:]
            for ep_multi, ep_single in zip(per_host,
                                           single["epoch_decodes"][1:]):
                assert ep_multi <= 8 < ep_single, (per_host, single)
