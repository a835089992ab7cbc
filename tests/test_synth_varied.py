"""Round-5 speech-diversity probe: the `varied` synthetic utterance
generator (data/synthetic.py::synthetic_speech_varied) and its plumbing
through the CLI corpus builder and the evaluate-grid fallback.

Motivation (RESULTS.md round-5 finding #4): the reference's demo signal
(main.py:51-63) is ONE fixed formant pattern, so a "corpus" of it has no
speech diversity; training saturates by epoch ~30 even with the 4-class
noise bank. `varied` draws a distinct randomized utterance per seed.
"""

import numpy as np

from sincformer_tpu.data.synthetic import (synthetic_speech,
                                           synthetic_speech_varied)


def _corr(x, y):
    m = min(len(x), len(y))
    return float(np.corrcoef(x[:m], y[:m])[0, 1])


def test_varied_deterministic_per_seed():
    a = synthetic_speech_varied(1.7, seed=3)
    b = synthetic_speech_varied(1.7, seed=3)
    assert a.dtype == np.float32 and len(a) == int(8000 * 1.7)
    assert np.array_equal(a, b)


def test_varied_is_actually_diverse():
    utts = [synthetic_speech_varied(2.0, seed=i) for i in range(6)]
    # pairwise near-zero correlation (distinct f0/formants/segmentation) —
    # vs the fixed generator, where two draws are IDENTICAL
    for i in range(len(utts)):
        for j in range(i + 1, len(utts)):
            assert abs(_corr(utts[i], utts[j])) < 0.2
    fixed = synthetic_speech(2.0)
    assert np.array_equal(fixed, synthetic_speech(2.0))


def test_varied_is_speech_band_and_normalized():
    for seed in (0, 7, 123):
        s = synthetic_speech_varied(2.0, seed=seed)
        assert np.isclose(np.max(np.abs(s)), 1.0, atol=1e-3)
        spec = np.abs(np.fft.rfft(s)) ** 2
        f = np.fft.rfftfreq(len(s), 1 / 8000)
        assert spec[f < 3800].sum() / spec.sum() > 0.95
        # non-degenerate: real signal content, some quiet structure
        assert np.sqrt((s ** 2).mean()) > 0.05


def test_corpus_builder_speech_kinds():
    from sincformer_tpu.cli import _synthetic_corpus
    clean_f, noises = _synthetic_corpus(6, "multi", "formant")
    clean_v, _ = _synthetic_corpus(6, "multi", "varied")
    assert len(clean_f) == len(clean_v) == 6
    assert set(noises) == {"white", "babble", "factory1", "destroyerengine"}
    # same rng(42) draw order → identical durations and scales, so the two
    # corpora differ ONLY in speech content (controlled comparison)
    for f_, v_ in zip(clean_f, clean_v):
        assert len(f_) == len(v_)
    # formant corpus: all utterances are the same pattern (scaled crops of
    # one signal); varied corpus: essentially uncorrelated utterances
    assert abs(_corr(clean_f[0], clean_f[1])) > 0.5
    assert abs(_corr(clean_v[0], clean_v[1])) < 0.2


def test_cli_accepts_synth_speech_flag():
    from sincformer_tpu.cli import build_parser
    p = build_parser()
    a = p.parse_args(["train", "--synthetic", "4", "--synth-speech",
                      "varied", "--synth-noises", "multi"])
    assert a.synth_speech == "varied"
    e = p.parse_args(["evaluate", "--synth-speech", "varied"])
    assert e.synth_speech == "varied"


def test_grid_fallback_seeds_disjoint_from_training():
    # evaluate's varied fallback uses seeds 500_000+i; training uses
    # 1000+i — no utterance overlap between train corpus and eval set
    tr = synthetic_speech_varied(2.0, seed=1000)
    ev = synthetic_speech_varied(2.0, seed=500_000)
    assert abs(_corr(tr, ev)) < 0.2
