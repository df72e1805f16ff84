"""Regression guards for BENCH/BASELINE.md section bookkeeping.

VERDICT r5 what's-wrong #1: bench_scaling.main()'s full-file rewrite used
to silently delete the marker-owned sections that memory_headroom_report /
dup_bench_report / append_numpy_ceiling maintain via _replace_section.
These tests pin the preservation contract without launching Spark: they
exercise the pure markdown-merging helpers against temp content.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench_scaling as bs  # noqa: E402

TEMPLATE = """# BENCH — scaling efficiency (N vs 4N)

headline tables here

## Flagship per-stage breakdown (VERDICT r02 next-round #2)

flagship stage tables

## Relational per-stage breakdown (VERDICT r03 #1 / r04 top_next)

relational stage tables
"""

OLD = TEMPLATE + """
## Dedup-before-inference on a duplicate-heavy corpus

dup A/B evidence THAT MUST SURVIVE

## Memory headroom at 4x/16x docs (the in-sandbox 100x proxy)

headroom evidence THAT MUST SURVIVE

## numpy-kernel burn (noise evidence, not a denominator)

burn range evidence

## Head-domain skew probe (domain_stats aggregation shape)

skew probe evidence THAT MUST SURVIVE
"""


def test_full_rewrite_preserves_marker_sections():
    new = TEMPLATE.replace("headline tables here", "REGENERATED tables")
    merged = bs._preserve_extra_sections(new, OLD)
    # regenerated content wins for template-owned sections
    assert "REGENERATED tables" in merged
    assert "headline tables here" not in merged
    # marker-owned sections survive, exactly once each
    for frag in (
        "dup A/B evidence THAT MUST SURVIVE",
        "headroom evidence THAT MUST SURVIVE",
        "burn range evidence",
        "skew probe evidence THAT MUST SURVIVE",
    ):
        assert merged.count(frag) == 1
    # no heading duplicated
    heads = bs._headings(merged)
    assert len(heads) == len(set(heads)) == 6


def test_preserve_is_noop_when_old_has_no_extras():
    merged = bs._preserve_extra_sections(TEMPLATE, TEMPLATE)
    assert bs._headings(merged) == bs._headings(TEMPLATE)


def test_replace_section_roundtrip(tmp_path, monkeypatch):
    """_replace_section updates exactly its own span; a subsequent
    full-rewrite merge keeps the result (the end-to-end r5 failure mode)."""
    bench = tmp_path / "BENCH"
    bench.mkdir()
    (bench / "BASELINE.md").write_text(OLD)
    monkeypatch.setattr(bs, "REPO", tmp_path)

    marker = "## Dedup-before-inference on a duplicate-heavy corpus"
    bs._replace_section(marker, f"{marker}\n\nrefreshed dup evidence v2\n")
    md = (bench / "BASELINE.md").read_text()
    assert "refreshed dup evidence v2" in md
    assert "dup A/B evidence THAT MUST SURVIVE" not in md  # replaced
    assert "headroom evidence THAT MUST SURVIVE" in md  # untouched
    assert "burn range evidence" in md  # untouched (last section)

    # now simulate main()'s rewrite on top of the refreshed file
    merged = bs._preserve_extra_sections(TEMPLATE, md)
    assert "refreshed dup evidence v2" in merged
    assert "headroom evidence THAT MUST SURVIVE" in merged
