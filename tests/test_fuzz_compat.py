"""Adversarial bit-compat fuzzing: tie-heavy inputs stress exactly the
ordering rules (val desc / pos desc, first-argmax modes, last-wins slots)
that separate a bit-compatible rebuild from an approximate one."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audfprint_tpu import params as P  # noqa: E402
from audfprint_tpu.index import device_table as DT  # noqa: E402
from audfprint_tpu.index.hash_table import HashTable  # noqa: E402
from audfprint_tpu.match import voting  # noqa: E402
from audfprint_tpu.ops import pallas_peaks as PP  # noqa: E402
from audfprint_tpu.ops import peaks as JP  # noqa: E402
from audfprint_tpu.ops import spectro as SP  # noqa: E402
from audfprint_tpu.ops.config import PipelineConfig  # noqa: E402
from audfprint_tpu.oracle import analyze as oa  # noqa: E402
from audfprint_tpu.oracle import match as om  # noqa: E402

CFG = PipelineConfig()
AP = P.AnalyzerParams()


def _tie_sgram(rng, B=2, T=40, F=256):
    """Spectrogram quantized to few distinct values: equal-value peaks
    everywhere -> every tie-break rule fires constantly."""
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    return np.round(x * 2).astype(np.float32) / 2  # values in {-k/2..k/2}


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_tie_heavy_peaks_bitexact(seed):
    rng = np.random.default_rng(seed)
    sg = _tie_sgram(rng)
    B, T, F = sg.shape
    nf = jnp.asarray(np.array([T, T - 3], np.int32))
    got = np.asarray(JP.find_peaks_mask(jnp.asarray(sg), nf, CFG))
    for b in range(B):
        n = int(np.asarray(nf)[b])
        want = oa.bwd_prune(sg[b, :n], oa.fwd_prune(sg[b, :n], AP), AP)
        assert np.array_equal(got[b, :n], want), f"seed {seed} row {b}"
    # pallas interpret path agrees too (it re-applies the HPF internally,
    # so compare through the same front end)
    pre = rng.standard_normal((B, T, F)).astype(np.float32)
    pre = np.round(pre).astype(np.float32)
    want2 = JP.find_peaks_mask(SP.hpf(jnp.asarray(pre), CFG), nf, CFG)
    got2 = PP.find_peaks_mask_fused(jnp.asarray(pre), nf, CFG,
                                    interpret=True)
    assert np.array_equal(np.asarray(got2), np.asarray(want2))


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_duplicate_heavy_store_and_match(seed):
    """Streams full of duplicate hashes/times: reservoir overflow, slot
    collisions, and histogram ties everywhere."""
    rng = np.random.default_rng(seed)
    tcfg = DT.TableConfig(hashbits=8, depth=4, maxtimebits=8)
    ht = HashTable(hashbits=8, depth=4, maxtime=256)
    streams = []
    for i in range(4):
        n = 300
        pairs = np.stack([rng.integers(0, 64, n),
                          rng.integers(0, 16, n)], axis=1).astype(np.int32)
        streams.append(pairs)
        ht.store(f"t{i}", pairs)
    table, counts = DT.empty_table(tcfg)
    L = max(len(s) for s in streams)
    tt = np.stack([s[:, 0] for s in streams])
    hh = np.stack([s[:, 1] for s in streams])
    vv = np.ones((4, L), bool)
    table, counts = DT.store_batch(
        table, counts, jnp.asarray(tt), jnp.asarray(hh), jnp.asarray(vv),
        jnp.arange(4, dtype=jnp.int32), tcfg)
    assert np.array_equal(np.asarray(table), ht.table)
    assert np.array_equal(np.asarray(counts), ht.counts)

    # match a duplicate-heavy query: device rows == oracle rows exactly,
    # across the full option matrix (exact x time-range x sort-by-time —
    # the sbt axis pins the earliest-mode selection rule)
    q = np.stack([rng.integers(0, 32, 60),
                  rng.integers(0, 16, 60)], axis=1).astype(np.int32)
    q = np.unique(q, axis=0)
    Q = 64
    qt = np.zeros((1, Q), np.int32)
    qh = np.zeros((1, Q), np.int32)
    qv = np.zeros((1, Q), bool)
    qt[0, :len(q)] = q[:, 0]
    qh[0, :len(q)] = q[:, 1]
    qv[0, :len(q)] = True
    hpi = np.zeros(16, np.int32)
    hpi[:4] = ht.hashesperid
    for exact in (False, True):
        for timerange in (False, True):
            for sbt in (False, True):
                mp = P.MatcherParams(search_depth=8, max_returns=4,
                                     threshcount=1, exact_count=exact,
                                     find_time_range=timerange,
                                     sort_by_time=sbt)
                want = om.match_hashes(ht, q, mp)
                mcfg = voting.MatchConfig.from_params(
                    mp, qt_cap=64, n_ids_cap=16)
                out = voting.match_batch(
                    table, counts, jnp.asarray(hpi), jnp.asarray(qt),
                    jnp.asarray(qh), jnp.asarray(qv), tcfg, mcfg)
                n = int(out["n_results"][0])
                got = np.stack([np.asarray(out[k])[0] for k in
                                ("ids", "filtcount", "mode_dt", "rawcount",
                                 "min_t", "max_t")], axis=1)[:n]
                assert np.array_equal(got, want), \
                    f"seed {seed} exact={exact} tr={timerange} sbt={sbt}"
