"""Seed-index scalability behaviors (tile stepping, repeat caps) and
region-level fault isolation."""

import numpy as np

from breakmer_tpu.align.index import GenomeIndex, SeedIndex
from breakmer_tpu.encode import encode_seq
from tests.fixtures import rand_seq


def test_stepped_index_still_finds_hits():
    ref = rand_seq(41, 2000)
    dense = SeedIndex(encode_seq(ref), 11, step=1)
    tiled = SeedIndex(encode_seq(ref), 11, step=11)
    assert len(tiled._pos) < len(dense._pos) / 5
    q = encode_seq(ref[700:850])
    wd = dense.candidates(q)
    wt = tiled.candidates(q)
    assert wd and wt
    assert wt[0].t_start <= 700 and wt[0].t_end >= 850


def test_repeat_seed_cap():
    # a 3000bp tandem array of a 30bp unit: every kmer occurs ~100 times
    unit = rand_seq(43, 30)
    ref = unit * 100
    idx = SeedIndex(encode_seq(ref), 11, max_hits_per_seed=16)
    counts = np.bincount(np.searchsorted(np.unique(idx._codes), idx._codes))
    assert counts.max() <= 16
    uncapped = SeedIndex(encode_seq(ref), 11, max_hits_per_seed=0)
    assert len(uncapped._pos) > len(idx._pos)


def test_genome_index_auto_step_small():
    gi = GenomeIndex({"c": rand_seq(44, 1000)}, 11)
    assert gi.step == 1  # small genome -> dense


def test_genome_index_explicit_step_roundtrip(tmp_path):
    gi = GenomeIndex({"c": rand_seq(45, 3000)}, 11, step=11)
    gi.save(tmp_path / "g.npz")
    gi2 = GenomeIndex.load(tmp_path / "g.npz")
    assert gi2.step == 11
    q = encode_seq(rand_seq(45, 3000)[1000:1150])
    assert [(w.t_start, w.t_end) for w in gi.candidates(q)] == [
        (w.t_start, w.t_end) for w in gi2.candidates(q)
    ]


def test_region_fault_isolation(tmp_path, monkeypatch):
    """A crashing region must not take down the panel: its error lands in
    the ledger/metrics and other regions complete (SURVEY.md §5 failure
    detection — the reference loses the region silently [UNCERTAIN])."""
    import json
    from pathlib import Path

    import breakmer_tpu.pipeline as pipeline_mod
    from breakmer_tpu.config import Config
    from breakmer_tpu.io.fasta import write_fasta
    from breakmer_tpu.runner import Runner
    from tests.fixtures import Haplotype, NovelBlock, RefBlock, SamBuilder

    genome = {"chr1": rand_seq(46, 4000)}
    write_fasta(tmp_path / "genome.fa", genome)
    (tmp_path / "targets.bed").write_text(
        "chr1\t500\t1100\tBOOM\nchr1\t2000\t2600\tOK\n")
    INS = "TTGACCATGGATCCGGTACAT"
    hap = Haplotype(genome, [
        RefBlock("chr1", 2000, 2300), NovelBlock(INS), RefBlock("chr1", 2300, 2600),
    ])
    sam = SamBuilder(genome)
    sam.add_haplotype_reads(hap, 180, 440)
    sam.add_background_pairs("chr1", 300, 2800)
    sam.write(tmp_path / "sample.sam")

    real_find = pipeline_mod.TargetPipeline.find_sv_reads

    def boom(self, records=None, extract_result=None):
        if self.target.name == "BOOM":
            raise RuntimeError("injected fault")
        return real_find(self, records, extract_result)

    monkeypatch.setattr(pipeline_mod.TargetPipeline, "find_sv_reads", boom)
    cfg = Config(
        analysis_name="fi", analysis_dir=str(tmp_path / "a"),
        targets_bed_file=str(tmp_path / "targets.bed"),
        reference_fasta=str(tmp_path / "genome.fa"),
        sample_bam_file=str(tmp_path / "sample.sam"), indel_sr_thresh=2,
    )
    runner = Runner(cfg)
    runner.setup()
    events = runner.run()
    # OK region still called despite BOOM crashing
    assert len(events) == 1 and events[0].genes == "OK"
    ledger = json.loads((Path(cfg.analysis_dir) / "ledger.json").read_text())
    assert "injected fault" in (ledger["BOOM"]["error"] or "")
    metrics = json.loads((Path(cfg.analysis_dir) / "metrics.json").read_text())
    assert "BOOM" in metrics["errors"]
