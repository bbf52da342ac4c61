"""Matcher/Analyzer Python API parity: match_file, file_match_to_msgs,
illustrate_match, wavfile2peaks, ingest (reference class surface)."""

import os

import numpy as np
import pytest

from audfprint_tpu.index.hash_table import HashTable
from audfprint_tpu.match.matcher import Matcher
from audfprint_tpu.models.analyzer import Analyzer
from audfprint_tpu.utils.audio import audio_write_wav
from tests.conftest import synth_audio

SR = 11025


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(123)
    d = tmp_path_factory.mktemp("api")
    tracks = [synth_audio(rng, dur_sec=6.0, n_tones=50) for _ in range(2)]
    for i, x in enumerate(tracks):
        audio_write_wav(str(d / f"t{i}.wav"), x, SR)
    q = tracks[1][SR: 4 * SR]
    audio_write_wav(str(d / "q.wav"), q, SR)
    analyzer = Analyzer()
    ht = HashTable(hashbits=16, depth=20, maxtime=4096)
    for i in range(2):
        dur, nh = analyzer.ingest(ht, str(d / f"t{i}.wav"))
        assert abs(dur - 6.0) < 0.05 and nh > 20
    return d, analyzer, ht


def test_match_file_and_msgs(setup):
    d, analyzer, ht = setup
    m = Matcher()
    rows, dur, nhash = m.match_file(analyzer, ht, str(d / "q.wav"))
    assert len(rows) == 1 and rows[0][0] == 1
    msgs = m.file_match_to_msgs(analyzer, ht, str(d / "q.wav"))
    assert len(msgs) == 1 and msgs[0].startswith("Matched")
    assert "t1.wav" in msgs[0] and "at rank 0" in msgs[0]


def test_match_hashes_matches_oracle(setup):
    from audfprint_tpu import params as P
    from audfprint_tpu.oracle import match as om

    d, analyzer, ht = setup
    qh = analyzer.wavfile2hashes(str(d / "q.wav"))
    got = Matcher().match_hashes(ht, qh)
    want = om.match_hashes(ht, qh, P.MatcherParams())
    assert np.array_equal(got, want)


def test_match_hashes_windowed(setup):
    """Library broadcast monitoring: a concatenated stream (track0 then
    track1, hash domain) reports each track in its window, window offsets
    are subtracted, and slicing invariants hold (hop grid, tail rule)."""
    from audfprint_tpu.match.matcher import slice_hash_windows

    d, analyzer, ht = setup
    fps = analyzer.target_sr / analyzer.n_hop
    h0 = analyzer.wavfile2hashes(str(d / "t0.wav"))
    h1 = analyzer.wavfile2hashes(str(d / "t1.wav")).copy()
    off = int(round(6.0 * fps))
    h1[:, 0] += off                        # track1 starts at t=6 s
    stream = np.concatenate([h0, h1])

    wins = slice_hash_windows(stream, 12.0, 6.0, fps, hop_sec=6.0)
    assert [round(t0, 1) for t0, _, _ in wins] == [0.0, 6.0]
    # offsets subtracted: every window's hashes start near 0 (within the
    # first-landmark latency, a few dozen frames)
    assert all(h[:, 0].min() < 64 for _, h, _ in wins if len(h))

    res = Matcher().match_hashes_windowed(ht, stream, 12.0, 6.0, fps,
                                          hop_sec=6.0)
    assert [int(rows[0][0]) for _t0, rows, _nh, _wd in res] == [0, 1]
    # window duration = ww frames / fps ~= the requested 6 s
    assert all(abs(wd - 6.0) < 2 / fps for *_x, wd in res)


def test_wavfile2peaks(setup):
    d, analyzer, ht = setup
    pks = analyzer.wavfile2peaks(str(d / "t0.wav"))
    assert len(pks) > 30
    assert all(0 <= f < 256 for _, f in pks)
    # sorted by (t, bin)
    assert pks == sorted(pks)


def test_illustrate_match(setup, tmp_path):
    d, analyzer, ht = setup
    out = str(tmp_path / "ill.png")
    m = Matcher()
    path = m.illustrate_match(analyzer, ht, str(d / "q.wav"), out_png=out)
    assert path == out and os.path.getsize(out) > 10000


def test_illustrate_vs_hpf_render_differently(setup, tmp_path):
    """-I draws the plain whitened spectrogram, -J the HPF'd one: the two
    spectrogram arrays AND the rendered PNGs must differ (reference
    audfprint_match.py:~300-380 applies the HPF only under -J)."""
    from audfprint_tpu import params as P
    from audfprint_tpu.oracle import analyze as oa

    d, analyzer, ht = setup
    wav = str(d / "q.wav")
    samples = analyzer.read_audio(wav)
    prm = P.AnalyzerParams(density=analyzer.density, n_fft=analyzer.n_fft,
                           n_hop=analyzer.n_hop, f_sd=analyzer.f_sd)
    sg_plain = oa.spectrogram(samples, prm, hpf=False)
    sg_hpf = oa.spectrogram(samples, prm, hpf=True)
    assert sg_plain.shape == sg_hpf.shape
    assert not np.array_equal(sg_plain, sg_hpf)

    m = Matcher()
    p1 = m.illustrate_match(analyzer, ht, wav,
                            out_png=str(tmp_path / "i.png"), hpf=False)
    p2 = m.illustrate_match(analyzer, ht, wav,
                            out_png=str(tmp_path / "j.png"), hpf=True)
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() != f2.read()


def test_presets_and_batched_wavfiles(setup):
    from audfprint_tpu.models.presets import PRESETS, make_analyzer

    assert set(PRESETS) >= {"default", "noisy-query"}
    an = make_analyzer("noisy-query", density=30.0)
    assert an.shifts == 4 and an.density == 30.0

    d, _analyzer, _ht = setup
    an0 = make_analyzer("default")
    out = an0.wavfiles2hashes([str(d / "t0.wav"), str(d / "t1.wav")])
    assert len(out) == 2 and all(len(h) > 20 for h in out)
    # batched result equals single-file result
    single = an0.wavfile2hashes(str(d / "t0.wav"))
    import numpy as np
    assert np.array_equal(out[0], single)


def test_afpk_roundtrip_equals_direct_hashes(setup, tmp_path):
    """Peaks saved to .afpk and re-paired yield exactly the hashes of the
    direct audio pipeline (single-shift): the pairing is a pure function
    of the peak set."""
    import numpy as np

    from audfprint_tpu.utils import formats

    d, analyzer, ht = setup
    wav = str(d / "t0.wav")
    direct = analyzer.wavfile2hashes(wav)
    afpk = str(tmp_path / "t0.afpk")
    formats.peaks_save(afpk, analyzer.wavfile2peaks(wav))
    via_peaks = analyzer.wavfile2hashes(afpk)
    assert np.array_equal(direct, via_peaks)


def test_glob2hashtable_mixed_precompute(tmp_path):
    """glob2hashtable must ingest mixed audio + precomputed .afpt inputs
    in sorted order (review r3: the batched rewrite briefly routed .afpt
    files through audio decode)."""
    import numpy as np

    from audfprint_tpu.index.hash_table import HashTable
    from audfprint_tpu.models.analyzer import Analyzer
    from audfprint_tpu.utils import formats
    from audfprint_tpu.utils.audio import audio_write_wav
    from tests.conftest import synth_audio

    rng = np.random.default_rng(5)
    an = Analyzer()
    x = synth_audio(rng, dur_sec=3.0)
    audio_write_wav(str(tmp_path / "a.wav"), x, 11025)
    hashes = np.stack([np.sort(rng.integers(0, 1024, 50)),
                       rng.integers(0, 1 << 20, 50)], axis=1).astype(np.int32)
    formats.hashes_save(str(tmp_path / "b.afpt"), hashes)
    ht = an.glob2hashtable(str(tmp_path / "*.*"),
                           HashTable(hashbits=16, depth=10, maxtime=2048))
    assert len(ht.names) == 2
    # sorted order: a.wav gets id 0, b.afpt id 1
    assert ht.names[0].endswith("a.wav") and ht.names[1].endswith("b.afpt")
    assert int(ht.hashesperid[1]) == 50


@pytest.mark.parametrize("exact,timerange,sbt", [
    (False, False, False), (False, True, False), (True, True, True)])
def test_fused_matches_two_stage(setup, exact, timerange, sbt):
    """The fused one-graph fingerprint+match serving path is bit-identical
    to wavfile2hashes -> match_hashes_batch across the option matrix
    (round 4: one dispatch + one fetch instead of ~5 relay round trips).
    Covers mixed clip lengths (two buckets), an empty signal row, and
    int16 raw-PCM staging."""
    d, analyzer, ht = setup
    rng = np.random.default_rng(7)
    sigs = [
        synth_audio(rng, dur_sec=4.0, n_tones=40),
        synth_audio(rng, dur_sec=9.5, n_tones=60),     # other bucket
        np.zeros(0, np.float32),                       # empty row
        (synth_audio(rng, dur_sec=4.0, n_tones=40)
         * 32767).astype(np.int16),
    ]
    m = Matcher(exact_count=exact, find_time_range=timerange,
                sort_by_time=sbt, verbose=0, max_returns=2)
    fused = m.match_samples_fused(analyzer, ht, sigs)
    assert fused is not None
    got, nh = fused
    want = m.match_hashes_batch(ht, analyzer.samples_batch2hashes(sigs))
    hashes = analyzer.samples_batch2hashes(sigs)
    for g, w, n, h in zip(got, want, nh, hashes):
        assert n == len(h)
        np.testing.assert_array_equal(g, w)


def test_fused_qcap_fallback(setup):
    """A row whose unique-hash count exceeds the fused static cap must be
    re-matched two-stage (results unchanged, never truncated)."""
    d, analyzer, ht = setup
    rng = np.random.default_rng(11)
    sigs = [synth_audio(rng, dur_sec=6.0, n_tones=50),
            synth_audio(rng, dur_sec=3.0, n_tones=30)]
    hashes = analyzer.samples_batch2hashes(sigs)
    m = Matcher(verbose=0)
    # a cap provably below row 0's hash count forces the readback fallback
    m.fused_qcap = max(16, P_next_pow2_floor(len(hashes[0])))
    assert m.fused_qcap < len(hashes[0])
    got, nh = m.match_samples_fused(analyzer, ht, sigs)
    want = m.match_hashes_batch(ht, hashes)
    assert nh == [len(h) for h in hashes]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def P_next_pow2_floor(n: int) -> int:
    """Largest power of two strictly below n (n >= 2)."""
    return 1 << max(0, (int(n) - 1).bit_length() - 1)


def test_fused_ineligible_cases(setup):
    """The fused async declines (returns None) exactly when documented —
    a pinned hist core, or groups whose summed voting footprint exceeds
    the memory envelope — including on a mesh, where the fused shard_map
    path is otherwise ELIGIBLE since round 5 (VERDICT r4 #3; the
    eligible-mesh bit-identity itself is pinned by
    test_fused_ingest.test_fused_mesh_serving_matches_two_stage)."""
    import jax
    d, analyzer, ht = setup
    sig = [synth_audio(np.random.default_rng(3), dur_sec=4.0)]
    if len(jax.devices()) >= 2:
        m = Matcher(ndev=2, verbose=0)
        m.force_core = "hist"
        assert m.match_samples_fused_async(analyzer, ht, sig) is None
    m1 = Matcher(verbose=0)
    m1.force_core = "hist"
    assert m1.match_samples_fused_async(analyzer, ht, sig) is None
    m2 = Matcher(verbose=0)
    m2.mem_budget_bytes = 1     # sum-of-groups envelope can never fit
    assert m2.match_samples_fused_async(analyzer, ht, sig) is None
