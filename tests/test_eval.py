"""Evaluation metrics: BLEU sanity vs hand-computed values, distinct-n,
file-level flow including the n_samples-per-reference layout."""

import math

import pytest

from mmtg_tpu.eval import (
    corpus_bleu,
    distinct_n,
    evaluate_files,
    lyric_stats,
    tokenize_lyric,
)


def test_bleu_perfect_match():
    hyp = [list("青山一道同云雨")]
    res = corpus_bleu(hyp, [[list("青山一道同云雨")]])
    assert res["bleu1"] == pytest.approx(1.0)
    assert res["bleu4"] > 0.9  # smoothing keeps it near 1


def test_bleu_no_overlap():
    res = corpus_bleu([list("aaaa")], [[list("bbbb")]])
    assert res["bleu1"] == 0.0


def test_bleu_partial_hand_computed():
    # hyp "abcd", ref "abce": unigram 3/4; bigram matches ab,bc = 2/3
    # (method-1 smoothing touches only ZERO numerators)
    res = corpus_bleu([list("abcd")], [[list("abce")]])
    assert res["p1"] == pytest.approx(3 / 4)
    assert res["p2"] == pytest.approx(2 / 3)
    assert res["bp"] == pytest.approx(1.0)
    assert res["bleu2"] == pytest.approx(math.sqrt(0.75 * 2 / 3))


def test_bleu_matches_nltk_method1():
    """Direct oracle: our corpus BLEU == nltk corpus_bleu with
    SmoothingFunction(epsilon=0.1).method1 (the paper-comparable setup)."""
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    hyps = [list("青山一道同云雨"), list("明月何曾是两乡"), list("abcd")]
    refs = [
        [list("青山一道"), list("同云雨共风雪")],
        [list("明月何曾是两乡啊")],
        [list("wxyz")],
    ]
    sm = nltk_bleu.SmoothingFunction(epsilon=0.1).method1
    ours = corpus_bleu(hyps, refs)
    for n in range(1, 5):
        w = tuple(1 / n for _ in range(n))
        expected = nltk_bleu.corpus_bleu(refs, hyps, weights=w, smoothing_function=sm)
        assert ours[f"bleu{n}"] == pytest.approx(float(expected), rel=1e-9), n


def test_bleu_no_unigram_overlap_is_zero_like_nltk():
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    hyps, refs = [list("aaaa")], [[list("bbbb")]]
    sm = nltk_bleu.SmoothingFunction(epsilon=0.1).method1
    expected = nltk_bleu.corpus_bleu(refs, hyps, weights=(1.0,), smoothing_function=sm)
    assert corpus_bleu(hyps, refs)["bleu1"] == pytest.approx(float(expected)) == 0.0


def test_brevity_penalty():
    res = corpus_bleu([list("ab")], [[list("abcd")]])
    assert res["bp"] == pytest.approx(math.exp(1 - 4 / 2))


def test_distinct():
    assert distinct_n([list("aaaa")], 1) == pytest.approx(1 / 4)
    assert distinct_n([list("abcd")], 1) == 1.0
    assert distinct_n([list("abab")], 2) == pytest.approx(2 / 3)


def test_tokenize_strips_separator():
    assert tokenize_lyric("青山，明月") == ["青", "山", "明", "月"]


def test_lyric_stats():
    s = lyric_stats(["青山一道，明月何曾", "海内存知己"])
    assert s["lyrics"] == 2
    assert s["sentences_per_lyric"] == pytest.approx(1.5)


def test_evaluate_files_n_samples_layout(tmp_path):
    hyp = tmp_path / "hyp.txt"
    ref = tmp_path / "ref.txt"
    # 2 refs × 2 samples each
    hyp.write_text("青山一道\n青山一道\n明月何曾\n明月何曾\n", encoding="utf-8")
    ref.write_text("青山一道\n明月何曾\n", encoding="utf-8")
    out = evaluate_files(str(hyp), str(ref))
    assert out["bleu1"] == pytest.approx(1.0)
    assert 0 < out["distinct1"] <= 1


def test_evaluate_files_mismatch_raises(tmp_path):
    hyp = tmp_path / "hyp.txt"
    ref = tmp_path / "ref.txt"
    hyp.write_text("a\nb\nc\n", encoding="utf-8")
    ref.write_text("a\nb\n", encoding="utf-8")
    with pytest.raises(ValueError):
        evaluate_files(str(hyp), str(ref))


def test_bleu_short_hypotheses_zero_denominator():
    """Hypotheses shorter than n: nltk clamps each hypothesis's n-gram
    denominator to 1 (modified_precision) and method-1 smooths the zero
    numerator — p_n = eps/len(corpus), not 0 (round-2 review finding)."""
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import SmoothingFunction
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    hyps = [["a"], ["b"]]
    refs = [[["a", "c"]], [["b", "d"]]]
    ours = corpus_bleu(hyps, refs, max_n=2)
    sm = SmoothingFunction(epsilon=0.1).method1
    ref = nltk_bleu(refs, hyps, weights=(0.5, 0.5), smoothing_function=sm)
    assert abs(ours["bleu2"] - ref) < 1e-9
    assert ours["bleu2"] > 0.0
