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


def test_genome_index_parity_with_per_chrom_seedindex():
    """The direct-addressed global table must produce IDENTICAL candidate
    windows to the r1 design (dict of per-chrom SeedIndexes) — same
    per-chrom max-hits capping, same hit ordering, same window sort."""
    genome = {
        "chr1": rand_seq(61, 9000),
        "chr2": rand_seq(62, 5000) + "N" * 200 + rand_seq(63, 2000),
        # a repeat array that overflows the per-chrom cap
        "chrR": rand_seq(64, 30) * 120,
    }
    gi = GenomeIndex(genome, 11, step=1)
    ref_idx = {c: SeedIndex(encode_seq(s), 11, step=1) for c, s in genome.items()}

    def ref_candidates(q, **kw):
        out = []
        for chrom, idx in ref_idx.items():
            for w in idx.candidates(q, **kw):
                w.chrom = chrom
                out.append(w)
        out.sort(key=lambda w: (-w.nseeds, w.chrom, w.t_start, w.strand))
        return out[: kw.get("max_windows", 8)]

    rng = np.random.default_rng(9)
    key = lambda w: (w.chrom, w.t_start, w.t_end, w.strand, w.nseeds)
    for trial in range(10):
        chrom = ("chr1", "chr2", "chrR")[trial % 3]
        s = genome[chrom]
        start = int(rng.integers(0, len(s) - 300))
        q = encode_seq(s[start : start + 250])
        if trial % 3 == 1:
            from breakmer_tpu.encode import revcomp
            q = encode_seq(revcomp(s[start : start + 250]))
        assert [key(w) for w in gi.candidates(q)] == [
            key(w) for w in ref_candidates(q)
        ], f"trial {trial}"
        # per-chrom lookup parity too
        from breakmer_tpu.align.index import _seed_codes
        qc, _ = _seed_codes(q, 11)
        for code in qc[:5]:
            for c in genome:
                np.testing.assert_array_equal(
                    gi.lookup_chrom(c, int(code)),
                    ref_idx[c].lookup(int(code)),
                )


def test_genome_index_packed_fetch_roundtrip():
    """fetch_codes decodes from the 2-bit + N-interval store; windows at
    N-run boundaries and word (16-base) boundaries must round-trip."""
    seq = rand_seq(65, 500) + "N" * 37 + rand_seq(66, 100) + "NNN" + rand_seq(67, 60)
    gi = GenomeIndex({"c": seq}, 11, step=1)
    full = encode_seq(seq)
    for a, b in ((0, len(seq)), (495, 545), (500, 537), (16, 32), (630, 700),
                 (7, 23), (536, 538), (0, 1), (690, 800)):
        np.testing.assert_array_equal(
            gi.fetch_codes("c", a, b), full[max(0, a):b], err_msg=f"[{a}:{b})"
        )


def test_genome_index_streaming_scale_16mbp():
    """Genome-scale smoke (VERDICT r1 #1): 16 Mbp at gfServer-style
    step=k builds in seconds with a bounded resident footprint, and a
    planted probe is still found at the exact locus on both strands."""
    rng = np.random.default_rng(68)
    N = 16_000_000
    codes = rng.integers(0, 4, N, dtype=np.int8)
    codes[8_000_000:8_050_000] = 4  # assembly-gap N run
    gi = GenomeIndex({"chr1": codes}, 11, step=11)
    # resident budget: packed (~N/4) + positions (4 B per seed ~ N/step)
    # + the fixed 33.5 MB bucket table; 2x headroom
    budget = 2 * (N // 4 + 4 * (N // 11) + 34_000_000)
    assert gi.nbytes < budget, f"{gi.nbytes} vs {budget}"
    q = codes[12_000_000:12_000_300].copy()
    wins = gi.candidates(q)
    assert wins and wins[0].strand == "+"
    assert wins[0].t_start <= 12_000_000 and wins[0].t_end >= 12_000_300
    from breakmer_tpu.encode import revcomp_codes
    wins_rc = gi.candidates(revcomp_codes(q))
    assert wins_rc and wins_rc[0].strand == "-"
    assert wins_rc[0].t_start <= 12_000_000 and wins_rc[0].t_end >= 12_000_300
    # no seed positions inside the N run
    assert not ((gi._positions >= 8_000_000 - 11) & (gi._positions < 8_050_000)).any()


def test_genome_index_v1_cache_rejected(tmp_path):
    np.savez_compressed(tmp_path / "old.npz", **{
        "__k__": np.array([11]), "c::seed_codes": np.arange(3)})
    import pytest
    with pytest.raises(ValueError, match="pre-v2"):
        GenomeIndex.load(tmp_path / "old.npz")
