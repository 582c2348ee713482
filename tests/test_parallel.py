"""Multi-device tests: DP shard_map sweep + context-parallel correlation.

Runs on the virtual 8-device CPU mesh (conftest). Verifies the SURVEY.md §4
requirement: sharded statistics are bit-identical to single-device runs.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from openair4g_tpu.parallel import (make_mesh, ShardedSweep,
                                    sharded_pss_correlate)
from openair4g_tpu.utils.rng import host_keys
from openair4g_tpu.config import FrameParms
from openair4g_tpu.phy.sync import pss_time_replica


class TestShardedSweep:
    def test_matches_single_device_bitwise(self):
        from openair4g_tpu.sim.dlsim import DlsimConfig, DlsimAwgn
        cfg = DlsimConfig(mcs=4, n_rb=6, batch=16, n_turbo_iter=4)
        sim = DlsimAwgn(cfg)
        n0 = jnp.float32(10.0 ** (0.25))   # -2.5 dB: mixed pass/fail
        keys = jnp.asarray(host_keys(3, 16, stream=0))
        ok_single, _ = jax.jit(sim._trial_step)(keys, n0)
        errs_single = int((~np.asarray(ok_single)).sum())

        mesh = make_mesh(n_ue=8, n_t=1)
        sweep = ShardedSweep(lambda k, s: sim._trial_step(k, s)[0],
                             mesh, batch_per_device=2)
        errs_sharded, trials = sweep.run_snr(-2.5, 16, seed=3)
        assert trials == 16
        assert errs_sharded == errs_single
        assert 0 < errs_single < 16, "operating point should be mixed"

    def test_2d_mesh(self):
        from openair4g_tpu.sim.dlsim import DlsimConfig, DlsimAwgn
        sim = DlsimAwgn(DlsimConfig(mcs=0, n_rb=6, batch=8, n_turbo_iter=2))
        mesh = make_mesh(n_ue=4, n_t=2)
        sweep = ShardedSweep(lambda k, s: sim._trial_step(k, s)[0],
                             mesh, batch_per_device=2)
        errs, trials = sweep.run_snr(3.0, 8)
        assert trials == 8 and errs == 0


class TestTimeSharded:
    def test_peaks_across_halo(self):
        fp = FrameParms(n_rb=6)
        mesh = make_mesh(n_ue=2, n_t=4)
        block = 512
        L = block * 4
        corr = sharded_pss_correlate(mesh, fp.n_fft, block)
        # peaks: inside a block, exactly straddling each boundary
        cases = [5, block - 64, 2 * block - 1, 3 * block - 100]
        r = np.zeros((len(cases), L), np.complex64)
        for b, tp in enumerate(cases):
            r[b, tp:tp + fp.n_fft] = pss_time_replica(b % 3, fp.n_fft)
        rd = jax.device_put(jnp.asarray(r), NamedSharding(mesh, P(None, "t")))
        pos, nid2, peak = corr(rd)
        assert list(np.asarray(pos)) == cases
        assert list(np.asarray(nid2)) == [c % 3 for c in range(len(cases))]

    def test_matches_unsharded_correlation(self):
        from openair4g_tpu.phy.sync import CellSearch
        fp = FrameParms(n_rb=6)
        mesh = make_mesh(n_ue=1, n_t=8)
        block = 512
        L = block * 8
        corr = sharded_pss_correlate(mesh, fp.n_fft, block)
        rng = np.random.default_rng(0)
        r = (rng.normal(size=(2, L)) + 1j * rng.normal(size=(2, L))
             ).astype(np.complex64) * 0.2
        r[0, 1000:1000 + fp.n_fft] += pss_time_replica(0, fp.n_fft) * 4
        r[1, 3000:3000 + fp.n_fft] += pss_time_replica(2, fp.n_fft) * 4
        rd = jax.device_put(jnp.asarray(r), NamedSharding(mesh, P(None, "t")))
        pos, nid2, _ = corr(rd)
        cs = CellSearch(fp, capture_len=L)
        pos_ref, nid2_ref, _ = cs.pss_correlate(jnp.asarray(r))
        assert np.array_equal(np.asarray(pos), np.asarray(pos_ref))
        assert np.array_equal(np.asarray(nid2), np.asarray(nid2_ref))


# --------------------------------------------- multi-host entry point ----

def test_distributed_sweep_matches_unsharded():
    """DistributedSweep on the 8-device mesh produces bit-identical error
    counts to the plain single-device accumulation (global-key
    determinism, SURVEY.md §4 multi-host requirement)."""
    import jax
    from openair4g_tpu.sim.dlsim import DlsimAwgn, DlsimConfig
    from openair4g_tpu.parallel.distributed import (DistributedSweep,
                                                    global_mesh)
    sim = DlsimAwgn(DlsimConfig(mcs=4, n_rb=6, n_turbo_iter=4, batch=32))
    mesh = global_mesh()
    assert mesh.shape["ue"] == 8
    sweep = DistributedSweep(sim._trial_step, mesh=mesh,
                             batch_per_device=4)
    snr = -0.5
    errs, trials, _ = sweep.run_snr(snr, 32)
    ref_errs, ref_trials = sim.run_snr(snr, 32)
    assert trials == ref_trials == 32
    assert errs == ref_errs, (errs, ref_errs)


def test_distributed_sweep_checkpoint_resume(tmp_path):
    """Interrupted sweep resumes from the checkpoint without repeating
    finished chunks (stream index advances monotonically)."""
    from openair4g_tpu.sim.dlsim import DlsimAwgn, DlsimConfig
    from openair4g_tpu.parallel.distributed import distributed_bler_sweep

    def factory():
        sim = DlsimAwgn(DlsimConfig(mcs=4, n_rb=6, n_turbo_iter=4))
        sim.trial_ok = sim._trial_step
        return sim

    ck = str(tmp_path / "sweep.json")
    rows1 = distributed_bler_sweep(factory, [0.0], 32, batch_per_device=4,
                                   ckpt_path=ck, verbose=False)
    # resume with a larger target: only the delta runs, counts accumulate
    rows2 = distributed_bler_sweep(factory, [0.0], 64, batch_per_device=4,
                                   ckpt_path=None, verbose=False)
    import json
    with open(ck) as f:
        d = json.load(f)
    # re-run same config+target: fully resumed, nothing recomputed
    rows3 = distributed_bler_sweep(factory, [0.0], 32, batch_per_device=4,
                                   ckpt_path=ck, verbose=False)
    with open(ck) as f:
        d2 = json.load(f)
    assert rows3 == rows1
    assert d2 == d
    assert rows1[0][2] == 32 and rows2[0][2] == 64
