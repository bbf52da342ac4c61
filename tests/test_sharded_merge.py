"""Merge-as-resharding equals host merge (sharded table, 8 CPU devices)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audfprint_tpu.index import device_table as DT  # noqa: E402
from audfprint_tpu.index.hash_table import HashTable  # noqa: E402
from audfprint_tpu.parallel import sharded  # noqa: E402

TCFG = DT.TableConfig(hashbits=12, depth=8, maxtimebits=10, seed=0)


def _ht(rng, names):
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime)
    for n in names:
        pairs = np.stack([rng.integers(0, TCFG.maxtime, 200),
                          rng.integers(0, 1 << TCFG.hashbits, 200)],
                         axis=1).astype(np.int32)
        ht.store(n, pairs)
    return ht


def test_sharded_merge_matches_host(rng):
    ht_a = _ht(rng, ["a0", "a1"])
    ht_b = _ht(rng, ["b0", "b1", "b2"])

    want = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                     maxtime=TCFG.maxtime)
    want.merge(ht_a)
    want.merge(ht_b)

    mesh = sharded.make_mesh(8)
    table, counts = sharded.shard_table(mesh, jnp.asarray(ht_a.table),
                                        jnp.asarray(ht_a.counts))
    merge = sharded.sharded_merge_fn(mesh, TCFG)
    hs, es, vs = sharded.entry_streams(ht_b, id_offset=len(ht_a.names))
    table, counts = merge(table, counts, jnp.asarray(hs), jnp.asarray(es),
                          jnp.asarray(vs))
    # the replay walks exactly the entries the host merge walks, continuing
    # from ht_a's true-pressure counts -> identical slot decisions -> the
    # table contents are bit-identical everywhere.  counts differ only where
    # ht_b itself had overflowed (host records true combined pressure,
    # replay records stored-entry pressure) — rare bookkeeping difference.
    t_got = np.asarray(table)
    c_got = np.asarray(counts)
    assert np.array_equal(t_got, want.table)
    no_b_overflow = ht_b.counts <= TCFG.depth
    assert np.array_equal(c_got[no_b_overflow], want.counts[no_b_overflow])


def test_cli_device_merge_chain_matches_host(rng, tmp_path):
    """CLI do_merge over a mesh == the chained host merge, INCLUDING a
    source whose buckets overflow (the device counts are re-synced to true
    pressure between sources, so the next source's slot decisions match
    the host chain exactly — VERDICT r3 #5)."""
    from types import SimpleNamespace

    from audfprint_tpu import cli
    from audfprint_tpu.utils.timing import Stages

    ht_a = _ht(rng, ["a0", "a1"])
    # overflowing source: many entries in few buckets
    ht_b = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                     maxtime=TCFG.maxtime)
    for n in ("b0", "b1"):
        pairs = np.stack([rng.integers(0, TCFG.maxtime, 400),
                          rng.integers(0, 16, 400)], axis=1).astype(np.int32)
        ht_b.store(n, pairs)
    assert (ht_b.counts > TCFG.depth).any()
    ht_c = _ht(rng, ["c0"])

    paths = []
    for i, src in enumerate((ht_b, ht_c)):
        p = str(tmp_path / f"src{i}.pklz")
        src.save(p)
        paths.append(p)

    want = _ht(rng, [])
    want.table[:] = ht_a.table
    want.counts[:] = ht_a.counts
    want.names = list(ht_a.names)
    want.hashesperid = ht_a.hashesperid.copy()
    for p in paths:
        want.merge(HashTable(p))

    got = _ht(rng, [])
    got.table[:] = ht_a.table
    got.counts[:] = ht_a.counts
    got.names = list(ht_a.names)
    got.hashesperid = ht_a.hashesperid.copy()
    args = SimpleNamespace(ndev=8)
    msgs = []
    cli.do_merge(got, paths, args, msgs.append, Stages())
    assert np.array_equal(got.table, want.table)
    assert np.array_equal(got.counts, want.counts)
    assert got.names == want.names
    assert np.array_equal(got.hashesperid, want.hashesperid)
    assert len(msgs) == 2 and msgs[0].startswith("merged ")
