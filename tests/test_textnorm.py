"""Hand-written kernel fixtures — independent of datagen/golden, so the
golden pipeline can't be circular with itself."""

from __future__ import annotations

import pandas as pd

from barks_ocr_spark.kernels import textnorm as tn


def s(*vals: str) -> pd.Series:
    return pd.Series(list(vals))


def test_repair_linebreaks():
    out = tn.repair_linebreaks(s("ele­\nphant", "line-\nby", "a\nb", "  x   y "))
    assert out.tolist() == ["elephant", "line-by", "a b", "x y"]


def test_auto_correct():
    out = tn.auto_correct(s("G0 HOME", "G0!", "GO G0, NOW", "DOG0"))
    assert out.tolist() == ["GO HOME", "GO!", "GO GO, NOW", "DOG0"]


def test_rejected_tokens():
    out = tn.has_rejected_token(s("OO VV", "W", "WENT", "THE DUCK", "|"))
    assert out.tolist() == [True, True, False, False, True]


def test_curlify_basic_and_elision():
    out = tn.curlify(s('he said "hi"', "don't", "back in '49", "'em all", "'quote'"))
    assert out.tolist() == [
        "he said “hi”",
        "don’t",
        "back in ’49",
        "’em all",
        "‘quote’",
    ]


def test_page_number_shapes():
    out = tn.is_standalone_page_number(s("23", "xxviii", "1962", "4096", "ivxlcdmx", "hello"))
    # 1962 is 4 digits → still digits-only ≤8 chars → page number per
    # book_pages.py:189-196 (the 3-digit cap applies to the heading-token
    # rule, not the standalone rule)
    assert out.tolist() == [True, True, True, True, True, False]


def test_running_header_shape():
    out = tn.is_running_header_shape(
        s("xvi INTRODUCTION", "INTRODUCTION xvii", "6 CARL COMICS: CONVERSATIONS",
          "DONALD AULT / 1973 49", "plain body text", "1962 was a year")
    )
    assert out.tolist() == [True, True, True, True, False, False]


def test_heading_without_page_num():
    out = tn.heading_without_page_num(s("xvi INTRODUCTION", "INTRODUCTION xvii", "CHRONOLOGY"))
    assert out.tolist() == ["INTRODUCTION", "INTRODUCTION", "CHRONOLOGY"]


def test_reprinted():
    assert tn.is_reprinted_standalone(s("Reprinted: Four Color No. 9", "was Reprinted: x")).tolist() == [True, False]
    out = tn.strip_reprinted_clauses(
        s("the golf balls. Reprinted: Four Color No. 9", "keep me\nReprinted: drop line\nand me")
    )
    assert out.tolist() == ["the golf balls.", "keep me\nand me"]


def test_paragraph_open():
    out = tn.paragraph_is_open(
        s("ends here.", "ends mid", "shouted!", "what?", 'he said."',
          "it ended. (Mar. 21, 1967)", "open (aside", "ellipsis…")
    )
    assert out.tolist() == [False, True, False, False, False, False, True, False]


def test_soft_word_break_and_merge():
    assert tn.ends_with_soft_word_break(s("every-", "x -", "-", "end.")).tolist() == [
        True, False, False, False,
    ]
    out = tn.merge_join(s("every-", "open text"), s("thing else", "continues."))
    assert out.tolist() == ["every-thing else", "open text continues."]


def test_sentence_end_abbreviations():
    out = tn.has_dot_at_end_of_sentence(
        s("MR. DUCK WENT HOME", "HE LEFT. THEN CAME BACK", "NO DOTS", "SEE U.S. LAWS")
    )
    assert out.tolist() == [False, True, False, False]


def test_dash_checks():
    assert tn.has_dash_wrong_space(s("wait— !", "! —go", "a—b")).tolist() == [True, True, False]
    assert tn.has_dash_no_spaces(s("a—b", "1—2", "a — b")).tolist() == [True, False, False]


def test_tokenize_for_index():
    out = tn.tokenize_for_index(s("The Duck—found... a NUGGET, near (town)!", ""))
    assert out.tolist() == [["duck", "found", "nugget", "near", "town"], []]


def test_comparison_key():
    out = tn.comparison_key(s("A — B", "a--b", "A  –B"))
    assert out.tolist() == ["a-b", "a-b", "a-b"]


def test_spell_suggest():
    d = frozenset(["duck", "nugget", "town", "go"])
    out = tn.spell_suggest(s("duk found a nuget", "town.", "xyzzyq stays"), d)
    assert out.tolist() == ["duck found a nugget", "town.", "xyzzyq stays"]


def test_spell_suggest_fixed_mappings():
    """The q_spell_suggest plants rely on these exact difflib choices."""
    from barks_ocr_spark.plans.queries import SPELL_DICT

    d = frozenset(SPELL_DICT)
    out = tn.spell_suggest(s("vectqr sparc engin7 table key the a"), d)
    assert out.tolist() == ["vector spark engine table key the a"]
