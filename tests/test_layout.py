"""Unit tests: layout passes (operators/layout)."""

import numpy as np
import pytest

from pdf_extract_spark.functions.textops import TextRun
from pdf_extract_spark.operators import layout
from pdf_extract_spark.operators.layout import Line


def run(text, left, top, width=50.0, height=10.0, size=10.0, font="F1",
        family="Helvetica", angle=0):
    return TextRun(
        pageno=1, left=left, top=top, width=width, height=height,
        baseline=top + size, size=size, angle=angle, font=font,
        family=family, weight="normal", style="normal", color="#000000",
        text=text,
    )


def line(text, pageno=1, left=50.0, top=100.0, right=300.0, bottom=110.0,
         size=10.0, font="F1", family="Helvetica", block=0):
    return Line(pageno, left, top, right, bottom, size, font, family,
                "normal", "normal", "#000000", text, 0, block)


class TestW1Merge:
    def test_same_row_merges_with_space(self):
        runs = [run("Hello", 50, 100), run("World", 103, 100)]
        out = layout.runs_to_lines(runs, 1, 0)
        assert len(out) == 1
        assert out[0].text == "Hello World"

    def test_adjacent_fragments_no_space(self):
        runs = [run("Hel", 50, 100, width=30), run("lo", 80.5, 100, width=20)]
        out = layout.runs_to_lines(runs, 1, 0)
        assert out[0].text == "Hello"

    def test_gap_over_200_splits(self):
        runs = [run("left", 50, 100), run("right", 350, 100)]
        out = layout.runs_to_lines(runs, 1, 0)
        assert [l.text for l in out] == ["left", "right"]

    def test_baseline_tolerance_8px(self):
        runs = [run("a", 50, 100), run("b", 103, 106)]  # Δbaseline 6 ≤ 8
        out = layout.runs_to_lines(runs, 1, 0)
        assert len(out) == 1
        runs = [run("a", 50, 100), run("b", 103, 112)]  # Δbaseline 12 > 8
        out = layout.runs_to_lines(runs, 1, 0)
        assert len(out) == 2

    def test_longest_fragment_donates_font(self):
        runs = [
            run("x", 50, 100, font="F9", family="Courier"),
            run("a longer fragment", 55, 100, font="F1", family="Helvetica"),
        ]
        out = layout.runs_to_lines(runs, 1, 0)
        assert out[0].family == "Helvetica"


class TestFilters:
    def test_offpage_dropped(self):
        lines = [
            line("visible"),
            line("negative", left=-5.0),
            line("beyond", top=1000.0),
        ]
        out = layout.filter_offpage(lines, 612, 792)
        assert [l.text for l in out] == ["visible"]


class TestXYCut:
    def test_single_column_one_leaf(self):
        left = np.array([50.0, 50, 50])
        right = np.array([300.0, 280, 290])
        top = np.array([100.0, 112, 124])
        bottom = top + 10
        leaves = layout.xy_cut_leaves(left, right, top, bottom)
        assert len(leaves) == 1

    def test_two_columns_split_left_first(self):
        # two columns of 3 lines, gutter 40 px wide
        left = np.array([50.0, 50, 50, 340, 340, 340])
        right = np.array([300.0, 290, 295, 580, 575, 560])
        top = np.array([100.0, 112, 124, 100, 112, 124])
        bottom = top + 10
        leaves = layout.xy_cut_leaves(left, right, top, bottom)
        assert len(leaves) == 2
        assert sorted(leaves[0].tolist()) == [0, 1, 2]  # left column first
        assert sorted(leaves[1].tolist()) == [3, 4, 5]

    def test_full_width_title_splits_vertically_first(self):
        # title spanning both columns, then 2 columns below
        left = np.array([50.0, 50, 340])
        right = np.array([580.0, 300, 580])
        top = np.array([40.0, 100, 100])
        bottom = np.array([60.0, 110, 110])
        leaves = layout.xy_cut_leaves(left, right, top, bottom)
        assert leaves[0].tolist() == [0]  # title block first

    def test_word_gaps_do_not_split(self):
        # word-sized gaps (~3 px) in one line must not become gutters
        left = np.array([50.0, 83, 120])
        right = np.array([80.0, 117, 160])
        top = np.array([100.0, 100, 100])
        bottom = top + 10
        leaves = layout.xy_cut_leaves(left, right, top, bottom)
        assert len(leaves) == 1


class TestBoilerplate:
    def _doc(self, n_pages, header="Running Header"):
        lines = []
        for p in range(1, n_pages + 1):
            lines.append(line(header, pageno=p, top=10.0, bottom=20.0))
            lines.append(line(f"Body text of page {p} with content.",
                              pageno=p, top=300.0, bottom=310.0))
            lines.append(line(str(p), pageno=p, top=760.0, bottom=770.0))
        return lines

    def test_recurring_header_dropped(self):
        lines = self._doc(5)
        heights = {p: 792.0 for p in range(1, 6)}
        drop = layout.boilerplate_indices(lines, heights)
        dropped = {lines[i].text for i in drop}
        assert "Running Header" in dropped
        assert not any(t.startswith("Body") for t in dropped)

    def test_page_numbers_dropped(self):
        lines = self._doc(3)
        heights = {p: 792.0 for p in range(1, 4)}
        drop = layout.boilerplate_indices(lines, heights)
        assert {lines[i].text for i in drop} >= {"1", "2", "3"}

    def test_two_pages_keeps_headers(self):
        # frequency rule needs ≥3 pages; page numbers still dropped at 2
        lines = self._doc(2)
        heights = {1: 792.0, 2: 792.0}
        drop = layout.boilerplate_indices(lines, heights)
        kept = [lines[i].text for i in range(len(lines)) if i not in drop]
        assert "Running Header" in kept

    def test_body_zone_recurring_text_kept(self):
        lines = []
        for p in range(1, 6):
            lines.append(line("Repeated disclaimer mid-page", pageno=p,
                              top=400.0, bottom=410.0))
        drop = layout.boilerplate_indices(lines, {p: 792.0 for p in range(1, 6)})
        assert not drop


class TestParagraphs:
    def test_regular_leading_single_paragraph(self):
        lines = [line(f"line {i} with enough text here", top=100.0 + 12 * i,
                      bottom=110.0 + 12 * i) for i in range(4)]
        layout.segment_paragraphs(lines)
        assert {l.para for l in lines} == {0}

    def test_big_gap_breaks(self):
        lines = [
            line("first line of paragraph one xx", top=100, bottom=110),
            line("second line of paragraph one x", top=112, bottom=122),
            line("new paragraph after a big gap x", top=190, bottom=200),
        ]
        layout.segment_paragraphs(lines)
        assert [l.para for l in lines] == [0, 0, 1]

    def test_indent_shift_breaks(self):
        lines = [
            line("aligned at fifty with more text", top=100, bottom=110),
            line("shifted far right over hundred", top=112, bottom=122, left=180.0),
        ]
        layout.segment_paragraphs(lines)
        assert lines[1].para == 1

    def test_font_size_change_breaks(self):
        lines = [
            line("body text line with normal size", top=100, bottom=110),
            line("heading sized differently here!", top=112, bottom=126, size=18.0),
        ]
        layout.segment_paragraphs(lines)
        assert lines[1].para == 1

    def test_short_line_ends_paragraph(self):
        lines = [
            line("Title", top=100, bottom=110),
            line("body follows the short title xx", top=112, bottom=122),
        ]
        layout.segment_paragraphs(lines)
        assert lines[1].para == 1

    def test_block_change_breaks(self):
        lines = [
            line("column one content line herexx", top=100, bottom=110, block=0),
            line("column two content line herexx", top=100, bottom=110, block=1),
        ]
        layout.segment_paragraphs(lines)
        assert lines[1].para == 1
