"""Bounded-memory ingest (VERDICT r2 weak #4): a BAM bigger than
``preload_max_mb`` on disk with a sidecar index must be served by indexed
per-region seeks — never a whole-file inflate — with calls identical to
the preloaded run. Also covers the streaming whole-file BAM scan that
replaced the hold-everything inflate for no-region reads.

At test scale the bound is asserted structurally (no whole-file shared
structures get built); the >=1 GB RSS measurement lives in
tools/bench_bounded_ingest.py (INGEST_r03.json).
"""

import logging
from pathlib import Path

import pytest

from breakmer_tpu.config import Config
from breakmer_tpu.io.bam import BamReader, stream_bam_records, write_bam
from breakmer_tpu.io.fasta import write_fasta
from breakmer_tpu.io.sam import parse_sam_line
from breakmer_tpu.report import read_svs_out
from breakmer_tpu.runner import Runner
from tests.fixtures import (
    ErrorModel,
    Haplotype,
    NovelBlock,
    RefBlock,
    SamBuilder,
    rand_seq,
)

INS = "TTGACCATGGATCCGGTACAT"


@pytest.fixture(scope="module")
def bam_panel(tmp_path_factory):
    """One-chromosome panel (21bp insertion + 60bp deletion, noisy reads)
    written as a coordinate-sorted indexed BAM."""
    work = tmp_path_factory.mktemp("bounded")
    genome = {"chr1": rand_seq(7, 6000)}
    write_fasta(work / "genome.fa", genome)
    with open(work / "targets.bed", "w") as fh:
        fh.write("chr1\t1000\t1600\tGENE1\n")
        fh.write("chr1\t3000\t3600\tGENE2\n")

    sam = SamBuilder(genome, error_model=ErrorModel(), error_seed=9)
    sam.add_haplotype_reads(Haplotype(genome, [
        RefBlock("chr1", 1000, 1300), NovelBlock(INS),
        RefBlock("chr1", 1300, 1600),
    ]), 180, 440, prefix="g1")
    sam.add_haplotype_reads(Haplotype(genome, [
        RefBlock("chr1", 3000, 3300), RefBlock("chr1", 3360, 3600),
    ]), 180, 440, prefix="g2")
    sam.add_background_pairs("chr1", 800, 3800)
    sam.write(work / "sample.sam")

    records = []
    with open(work / "sample.sam") as fh:
        for line in fh:
            if not line.startswith("@"):
                records.append(parse_sam_line(line))
    records.sort(key=lambda r: r.pos)
    write_bam(work / "sample.bam", [("chr1", 6000)], records, index=True)
    assert (work / "sample.bam.bai").exists()

    cfg = Config(
        analysis_name="bounded",
        analysis_dir=str(work / "analysis"),
        targets_bed_file=str(work / "targets.bed"),
        reference_fasta=str(work / "genome.fa"),
        reference_data_dir=str(work / "refdata"),
        sample_bam_file=str(work / "sample.bam"),
        kmer_size=15,
        indel_size=15,
        indel_sr_thresh=2,
        rearr_sr_thresh=2,
    )
    return work, cfg


def _svs(cfg):
    return read_svs_out(Path(cfg.analysis_dir) / "output" / "bounded_svs.out")


def test_oversized_bam_autoselects_indexed_path(bam_panel, tmp_path):
    """preload stays requested (default True) but the file exceeds the
    threshold and has an index: the runner must flip to indexed fetch and
    produce the same calls as the preloaded run."""
    work, cfg = bam_panel
    ref = Runner(Config(**{**cfg.__dict__,
                           "analysis_dir": str(tmp_path / "pre")}))
    ref.setup()
    ref.run()
    assert ref._preload_effective() is True

    # threshold below the BAM's on-disk size -> indexed mode
    size_mb = Path(cfg.sample_bam_file).stat().st_size / 2**20
    r = Runner(Config(**{**cfg.__dict__,
                         "preload_max_mb": size_mb / 2,
                         "analysis_dir": str(tmp_path / "idx")}))
    r.setup()
    r.run()
    assert r._preload_effective() is False
    assert r._indexed_reader is not None        # the BAI path actually ran
    assert r._sample_records is None            # no whole-file record list
    assert r._native_cols is None               # no whole-file inflate
    key = lambda row: (row["genes"], row["sv_type"], row["sv_subtype"],
                       row["target_breakpoints"], row["contig_seq"])
    assert sorted(_svs(r.cfg), key=key) == sorted(_svs(ref.cfg), key=key)
    types = {row["genes"]: row["sv_subtype"] for row in _svs(r.cfg)}
    assert types.get("GENE1") == "I" and types.get("GENE2") in ("D", "del")


def test_oversized_bam_without_index_preloads_with_warning(bam_panel, tmp_path):
    """No sidecar index: indexed fetch is impossible, so the guard keeps
    preloading but says why. (The package logger sets propagate=False, so
    capture with a directly-attached handler rather than caplog.)"""
    work, cfg = bam_panel
    noidx = tmp_path / "noindex.bam"
    noidx.write_bytes(Path(cfg.sample_bam_file).read_bytes())
    r = Runner(Config(**{**cfg.__dict__,
                         "sample_bam_file": str(noidx),
                         "preload_max_mb": 1e-4,
                         "analysis_dir": str(tmp_path / "warn")}))
    records = []

    class _Grab(logging.Handler):
        def emit(self, rec):
            records.append(rec)

    lg = logging.getLogger("breakmer_tpu.runner")
    h = _Grab(level=logging.WARNING)
    lg.addHandler(h)
    try:
        assert r._preload_effective() is True
    finally:
        lg.removeHandler(h)
    assert any("no .bai/.csi index" in rec.getMessage() for rec in records)


def test_guard_disabled_with_none(bam_panel, tmp_path):
    work, cfg = bam_panel
    r = Runner(Config(**{**cfg.__dict__,
                         "preload_max_mb": None,
                         "analysis_dir": str(tmp_path / "off")}))
    assert r._preload_effective() is True


def test_stream_bam_records_identical_to_bamreader(bam_panel):
    """The bounded rolling-buffer scan must yield record-identical output
    to the hold-everything BamReader (it replaced it for no-region
    read_bam calls)."""
    work, cfg = bam_panel
    streamed = list(stream_bam_records(cfg.sample_bam_file))
    full = list(BamReader(cfg.sample_bam_file))
    assert streamed == full
    assert len(streamed) > 100
