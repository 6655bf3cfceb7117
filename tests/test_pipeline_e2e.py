"""End-to-end panel tests (BASELINE.json configs #1, #2, #4: single-region
indel call; large deletion / tandem dup; translocation with discordant
support), CPU-runnable (SURVEY.md §4.3)."""

import json
from pathlib import Path

import pytest

from breakmer_tpu.cli import main as cli_main
from breakmer_tpu.config import Config
from breakmer_tpu.io.fasta import write_fasta
from breakmer_tpu.report import event_row, read_svs_out
from breakmer_tpu.runner import Runner
from tests.fixtures import (
    ErrorModel,
    Haplotype,
    NovelBlock,
    RefBlock,
    SamBuilder,
    rand_seq,
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    """A 2-chromosome genome with four target genes and planted SVs:
    GENE1 20bp insertion, GENE2 60bp deletion, GENE3 tandem dup,
    GENE4 no SV, GENE5 translocation chr1<->chr2 with discordant pairs."""
    work = tmp_path_factory.mktemp("panel")
    genome = {"chr1": rand_seq(101, 12000), "chr2": rand_seq(202, 8000)}
    write_fasta(work / "genome.fa", genome)

    targets = [
        ("chr1", 1000, 1600, "GENE1"),
        ("chr1", 3000, 3800, "GENE2"),
        ("chr1", 5000, 5700, "GENE3"),
        ("chr1", 7000, 7500, "GENE4"),
        ("chr1", 9000, 9600, "GENE5"),
        ("chr1", 10500, 11400, "GENE6"),
    ]
    with open(work / "targets.bed", "w") as fh:
        for chrom, s, e, name in targets:
            fh.write(f"{chrom}\t{s}\t{e}\t{name}\n")

    # reads carry the realistic sequencing-error model (VERDICT r2 #1):
    # the exact-call assertions below must hold on NOISY reads
    sam = SamBuilder(genome, error_model=ErrorModel(), error_seed=42)
    INS = "TTGACCATGGATCCGGTACAT"  # 21bp novel insertion @ chr1:1300
    hap1 = Haplotype(genome, [
        RefBlock("chr1", 1000, 1300), NovelBlock(INS), RefBlock("chr1", 1300, 1600),
    ])
    sam.add_haplotype_reads(hap1, 180, 440, prefix="g1r")

    # GENE2: 60bp deletion chr1:3400-3460
    hap2 = Haplotype(genome, [
        RefBlock("chr1", 3000, 3400), RefBlock("chr1", 3460, 3800),
    ])
    sam.add_haplotype_reads(hap2, 280, 520, prefix="g2r")

    # GENE3: tandem duplication of chr1:5200-5400
    hap3 = Haplotype(genome, [
        RefBlock("chr1", 5000, 5400), RefBlock("chr1", 5200, 5700),
    ])
    sam.add_haplotype_reads(hap3, 280, 520, prefix="g3r")

    # GENE5: translocation chr1:9300 -> chr2:4000
    hap5 = Haplotype(genome, [
        RefBlock("chr1", 9000, 9300), RefBlock("chr2", 4000, 4400),
    ])
    sam.add_haplotype_reads(hap5, 180, 420, prefix="g5r")
    sam.add_discordant_pairs("chr1", 9300, "chr2", 4000, n=5)

    # GENE6: 150bp inversion of chr1:10850-11000
    hap6 = Haplotype(genome, [
        RefBlock("chr1", 10500, 10850),
        RefBlock("chr1", 10850, 11000, strand="-"),
        RefBlock("chr1", 11000, 11400),
    ])
    sam.add_haplotype_reads(hap6, 180, 680, prefix="g6r")

    # background coverage everywhere
    for chrom, s, e, name in targets:
        sam.add_background_pairs("chr1", s - 200, e + 200)
    sam.write(work / "sample.sam")

    cfg = Config(
        analysis_name="e2e",
        analysis_dir=str(work / "analysis"),
        targets_bed_file=str(work / "targets.bed"),
        reference_fasta=str(work / "genome.fa"),
        reference_data_dir=str(work / "refdata"),
        sample_bam_file=str(work / "sample.sam"),
        kmer_size=15,
        indel_size=15,
        indel_sr_thresh=2,
        rearr_sr_thresh=2,
        trl_sr_thresh=2,
    )
    return work, cfg, INS


@pytest.fixture(scope="module")
def run_events(panel):
    work, cfg, INS = panel
    runner = Runner(cfg)
    runner.setup()
    events = runner.run()
    return work, cfg, INS, runner, events


def test_e2e_insertion_called(run_events):
    _, _, INS, _, events = run_events
    g1 = [e for e in events if e.genes == "GENE1"]
    assert len(g1) == 1
    ev = g1[0]
    assert (ev.sv_type, ev.sv_subtype) == ("indel", "I")
    assert ev.size == len(INS)
    assert abs(ev.breakpoints[0][1] - 1300) <= 2
    assert INS in ev.contig_seq
    assert ev.split_read_count >= 2


def test_e2e_deletion_called(run_events):
    _, _, _, _, events = run_events
    g2 = [e for e in events if e.genes == "GENE2"]
    assert len(g2) == 1
    ev = g2[0]
    assert ev.sv_type in ("indel", "rearrangement")
    assert ev.sv_subtype in ("D", "del")
    assert abs(ev.size - 60) <= 3
    chrom, s, e = ev.breakpoints[0]
    assert abs(s - 3400) <= 3 and abs(e - 3460) <= 3


def test_e2e_tandem_dup_called(run_events):
    _, _, _, _, events = run_events
    g3 = [e for e in events if e.genes == "GENE3"]
    dups = [e for e in g3 if e.sv_subtype == "tandem_dup"]
    assert len(dups) == 1
    ev = dups[0]
    assert abs(ev.size - 200) <= 12
    chrom, s, e = ev.breakpoints[0]
    assert abs(s - 5200) <= 12 and abs(e - 5400) <= 12


def test_e2e_no_sv_in_clean_gene(run_events):
    _, _, _, _, events = run_events
    assert [e for e in events if e.genes == "GENE4"] == []


def test_e2e_inversion_called(run_events):
    _, _, _, _, events = run_events
    g6 = [e for e in events if e.genes == "GENE6"]
    invs = [e for e in g6 if e.sv_subtype == "inversion"]
    assert invs, f"no inversion: {[(e.sv_type, e.sv_subtype) for e in g6]}"
    assert all(e.sv_type == "rearrangement" for e in invs)
    # breakpoints may come as one (lo, hi) interval (3-segment grouping)
    # or as per-junction positions; both ends must be located either way
    positions = [
        p
        for e in invs
        for (chrom, s_, e_) in e.breakpoints
        for p in (s_, e_)
        if p is not None
    ]
    assert any(abs(p - 10850) <= 12 for p in positions), positions
    assert any(abs(p - 11000) <= 12 for p in positions), positions


def test_e2e_translocation_called(run_events):
    _, _, _, _, events = run_events
    g5 = [e for e in events if e.genes == "GENE5"]
    trls = [e for e in g5 if e.sv_type == "trl"]
    assert len(trls) == 1
    ev = trls[0]
    chroms = {bp[0] for bp in ev.breakpoints}
    assert chroms == {"chr1", "chr2"}
    bps = {bp[0]: bp[1] for bp in ev.breakpoints}
    assert abs(bps["chr1"] - 9300) <= 3
    assert abs(bps["chr2"] - 4000) <= 3
    assert ev.disc_read_count >= 2
    assert ev.split_read_count >= 2


def test_e2e_global_coverage_fallback(run_events):
    """Depth queries outside the target region (translocation partner
    locus) are served from the preloaded alignments."""
    _, _, _, runner, _ = run_events
    # chr2 partner locus: mates + partner-anchored reads pile up past 4006
    assert runner._global_coverage_at("chr2", 4050) > 0
    assert runner._global_coverage_at("chr2", 7900) == 0
    assert runner._global_coverage_at("chrX", 100) == 0


def test_e2e_global_coverage_binned_matches_scan(run_events):
    """The per-refid binned depth query (searchsorted over sorted
    (pos, end) arrays) must implement exactly the original full-table
    counting rule: primary mapped records with pos <= q < pos+ref_span
    (VERDICT r3 weak #2)."""
    _, _, _, runner, _ = run_events
    if runner._native_cols is None:
        pytest.skip("native columnar decode unavailable")
    cols, ref_names = runner._native_cols
    for chrom in ref_names:
        rid = ref_names.index(chrom)
        for q in (0, 1000, 3450, 4050, 5300, 7900, 9300, 11000):
            mask = (
                (cols["refid"] == rid)
                & ((cols["flag"] & (0x4 | 0x100 | 0x800)) == 0)
                & (cols["pos"] <= q)
                & (cols["pos"] + cols["ref_span"] > q)
            )
            assert runner._global_coverage_at(chrom, q) == int(mask.sum())


def test_e2e_keep_intermediates(panel, tmp_path):
    """keep_intermediates writes the reference's debugging fixtures:
    sv/clean fastq, kmer dump, contig fasta per target (SURVEY.md §4)."""
    work, cfg, INS = panel
    cfg2 = Config(**{**cfg.__dict__,
                     "keep_intermediates": True,
                     "analysis_dir": str(tmp_path / "analysis_keep")})
    runner = Runner(cfg2)
    runner.setup()
    runner.run()
    base = Path(cfg2.analysis_dir) / "targets" / "GENE1"
    assert (base / "data" / "sv_reads.fastq").exists()
    assert (base / "data" / "clean_reads.fastq").exists()
    assert (base / "kmers" / "sample_kmers.out").exists()
    assert (base / "contigs" / "contigs.fa").exists()
    from breakmer_tpu.io.fasta import read_fasta

    contigs = read_fasta(base / "contigs" / "contigs.fa")
    assert any(INS in seq for seq in contigs.values())
    kline = (base / "kmers" / "sample_kmers.out").read_text().splitlines()[0]
    km, count = kline.split("\t")
    assert len(km) == cfg2.kmer_size and int(count) >= cfg2.min_kmer_count


def test_e2e_output_file(run_events):
    work, cfg, _, _, events = run_events
    out = Path(cfg.analysis_dir) / "output" / "e2e_svs.out"
    assert out.exists()
    rows = read_svs_out(out)
    assert len(rows) == len(events)
    assert {r["genes"] for r in rows} == {"GENE1", "GENE2", "GENE3", "GENE5", "GENE6"}
    for r in rows:
        assert r["contig_seq"] and r["target_breakpoints"]


def test_e2e_vcf_output(run_events):
    work, cfg, INS, _, events = run_events
    from breakmer_tpu.vcf import read_vcf

    vcf = Path(cfg.analysis_dir) / "output" / "e2e.vcf"
    assert vcf.exists()
    rows = read_vcf(vcf)
    by_type = {}
    for r in rows:
        by_type.setdefault(r["info"]["SVTYPE"], []).append(r)
    ins = [r for r in by_type.get("INS", []) if r["info"]["GENES"] == "GENE1"]
    assert ins and int(ins[0]["info"]["SVLEN"]) == len(INS)
    assert abs(ins[0]["pos"] - 1300) <= 2
    dele = [r for r in by_type.get("DEL", []) if r["info"]["GENES"] == "GENE2"]
    assert dele
    assert abs(dele[0]["pos"] - 3400) <= 3
    assert abs(int(dele[0]["info"]["END"]) - 3460) <= 3
    assert int(dele[0]["info"]["SVLEN"]) == -60
    assert dele[0]["ref"] != "N"  # REF base came from the reference fasta
    bnds = by_type.get("BND", [])
    assert len(bnds) == 2  # translocation breakend pair
    mates = {r["id"]: r["info"]["MATEID"] for r in bnds}
    for rid, mate in mates.items():
        assert mates[mate] == rid
    assert by_type.get("INV") and by_type.get("DUP")
    # VCF is chrom/pos sorted
    keys = [(r["chrom"], r["pos"]) for r in rows]
    assert keys == sorted(keys, key=lambda kp: (kp[0], kp[1]))


def test_e2e_coverage_recorded(run_events):
    _, _, _, _, events = run_events
    # background pairs give nonzero depth at breakpoints
    for ev in events:
        assert any(c > 0 for c in ev.breakpoint_coverages), ev.genes


def test_e2e_stage_metrics(run_events):
    """metrics.json carries per-stage wall timers and the run-level SW
    cell/GCUPS meter (SURVEY.md §5 tracing row; BASELINE.json's required
    GCUPS metric surfaced per run, not just in bench.py)."""
    _, cfg, _, _, _ = run_events
    metrics = json.loads((Path(cfg.analysis_dir) / "metrics.json").read_text())
    stage_s = metrics["stage_s"]
    for stage in ("extract_clean", "kmer_device", "assemble", "realign", "classify"):
        assert stage in stage_s and stage_s[stage] >= 0.0, stage
    sw = metrics["sw"]
    assert sw["launches"] >= 1
    assert sw["cells"] > 0
    assert sw["gcups_wall"] > 0


def test_e2e_ledger_resume(panel):
    work, cfg, _ = panel
    ledger_path = Path(cfg.analysis_dir) / "ledger.json"
    assert ledger_path.exists()
    ledger = json.loads(ledger_path.read_text())
    assert set(ledger) == {"GENE1", "GENE2", "GENE3", "GENE4", "GENE5", "GENE6"}
    # resume: all targets in ledger -> no new work, no fresh events…
    runner = Runner(cfg)
    runner.setup()
    events = runner.run(resume=True)
    assert events == []
    assert runner.results == []
    # …but the aggregate output is REBUILT from the ledger, not clobbered
    out = Path(cfg.analysis_dir) / "output" / "e2e_svs.out"
    rows = read_svs_out(out)
    assert {r["genes"] for r in rows} == {"GENE1", "GENE2", "GENE3", "GENE5", "GENE6"}


def test_e2e_region_cache(panel):
    work, cfg, _ = panel
    cached = list(Path(cfg.reference_data_dir).glob("*_codes.npy"))
    assert len(cached) == 6


def test_cli_run(panel, tmp_path, capsys):
    work, cfg, INS = panel
    cfg_file = tmp_path / "cfg.json"
    cfg2 = Config(**{**cfg.__dict__, "analysis_dir": str(tmp_path / "analysis2")})
    cfg_file.write_text(cfg2.to_json())
    rc = cli_main(["run", str(cfg_file)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SV calls written" in out
    rows = read_svs_out(tmp_path / "analysis2" / "output" / "e2e_svs.out")
    assert {r["genes"] for r in rows} == {"GENE1", "GENE2", "GENE3", "GENE5", "GENE6"}


def test_cli_version(capsys):
    assert cli_main(["version"]) == 0
    assert capsys.readouterr().out.strip()


def test_e2e_normal_subtraction(tmp_path):
    """A germline event present in sample AND matched normal must be
    subtracted away (config: normal_bam_file; reference: compare_kmers
    normal subtraction)."""
    work = tmp_path
    genome = {"chr1": rand_seq(303, 3000)}
    write_fasta(work / "genome.fa", genome)
    (work / "targets.bed").write_text("chr1\t800\t1400\tGERM\n")
    INS = "TTGACCATGGATCCGGTACAT"
    hap = Haplotype(genome, [
        RefBlock("chr1", 800, 1100), NovelBlock(INS), RefBlock("chr1", 1100, 1400),
    ])
    sam = SamBuilder(genome)
    sam.add_haplotype_reads(hap, 180, 440, prefix="s")
    sam.add_background_pairs("chr1", 600, 1600)
    sam.write(work / "sample.sam")
    # the normal carries the same insertion (germline)
    nsam = SamBuilder(genome)
    nsam.add_haplotype_reads(hap, 180, 440, prefix="n")
    nsam.write(work / "normal.sam")

    base = dict(
        analysis_name="germ", targets_bed_file=str(work / "targets.bed"),
        reference_fasta=str(work / "genome.fa"),
        sample_bam_file=str(work / "sample.sam"),
        indel_sr_thresh=2,
    )
    r1 = Runner(Config(analysis_dir=str(work / "a1"), **base))
    r1.setup()
    without_normal = r1.run()
    assert len(without_normal) == 1  # somatic-mode: called

    r2 = Runner(Config(analysis_dir=str(work / "a2"),
                       normal_bam_file=str(work / "normal.sam"), **base))
    r2.setup()
    with_normal = r2.run()
    assert with_normal == []  # germline: subtracted by the normal


def test_e2e_other_regions_annotation(panel, tmp_path):
    """Translocation partner locus named in other_regions_file joins the
    genes column."""
    work, cfg, INS = panel
    other = tmp_path / "other.bed"
    other.write_text("chr2\t3800\t4600\tPARTNER9\n")
    cfg2 = Config(**{**cfg.__dict__,
                     "other_regions_file": str(other),
                     "analysis_dir": str(tmp_path / "analysis_other")})
    runner = Runner(cfg2)
    runner.setup()
    events = runner.run()
    trls = [e for e in events if e.sv_type == "trl"]
    assert trls and trls[0].genes == "GENE5,PARTNER9"


def test_genome_index_cache_roundtrip(tmp_path):
    from breakmer_tpu.align.index import GenomeIndex
    from breakmer_tpu.encode import encode_seq

    genome = {"chrA": rand_seq(7, 700), "chrB": rand_seq(8, 500)}
    gi = GenomeIndex(genome, 11)
    gi.save(tmp_path / "gi.npz")
    gi2 = GenomeIndex.load(tmp_path / "gi.npz")
    assert gi2.k == 11 and set(gi2.chroms) == {"chrA", "chrB"}
    q = encode_seq(genome["chrB"][200:280])
    w1 = gi.candidates(q)
    w2 = gi2.candidates(q)
    assert [(w.chrom, w.t_start, w.t_end, w.strand) for w in w1] == [
        (w.chrom, w.t_start, w.t_end, w.strand) for w in w2
    ]


def test_e2e_batched_regions_identical(run_events, tmp_path):
    """Config #3: the packed multi-region device k-mer path must produce
    the SAME calls as the serial path."""
    work, cfg, INS = run_events[:3]
    cfg2 = Config(**{**cfg.__dict__,
                     "batch_regions": True,
                     "analysis_dir": str(tmp_path / "analysis_batched")})
    runner = Runner(cfg2)
    runner.setup()
    runner.run()
    serial = read_svs_out(Path(cfg.analysis_dir) / "output" / "e2e_svs.out")
    batched = read_svs_out(Path(cfg2.analysis_dir) / "output" / "e2e_svs.out")
    assert batched == serial


def test_e2e_global_disc_support(tmp_path):
    """cfg.global_disc_support counts discordant pairs anchored OUTSIDE
    the region window (within disc_pair_window of the breakpoint) that
    the per-region map structurally misses — the reference's per-target
    dict has the same blind spot (VERDICT r1 weak #7, SURVEY.md §2 #13)."""
    work = tmp_path
    genome = {"chr1": rand_seq(101, 12000), "chr2": rand_seq(202, 8000)}
    write_fasta(work / "genome.fa", genome)
    (work / "targets.bed").write_text("chr1\t9000\t9600\tGENE5\n")
    sam = SamBuilder(genome)
    # translocation chr1:9300 -> chr2:4000
    hap = Haplotype(genome, [
        RefBlock("chr1", 9000, 9300), RefBlock("chr2", 4000, 4400),
    ])
    sam.add_haplotype_reads(hap, 180, 420, prefix="g5r")
    sam.add_discordant_pairs("chr1", 9300, "chr2", 4000, n=4)
    # 3 extra pairs anchored at ~chr1:8350-8450 — OUTSIDE the extraction
    # window (9000-200=8800) but within disc_pair_window (1000) of the
    # chr1:9300 breakpoint; only the global map can see them
    sam.add_discordant_pairs("chr1", 8550, "chr2", 4000, n=3, prefix="far")
    sam.add_background_pairs("chr1", 8800, 9800)
    sam.write(work / "sample.sam")
    base = dict(
        analysis_name="gdisc",
        targets_bed_file=str(work / "targets.bed"),
        reference_fasta=str(work / "genome.fa"),
        reference_data_dir=str(work / "refdata"),
        sample_bam_file=str(work / "sample.sam"),
        rearr_sr_thresh=2, trl_sr_thresh=2,
    )

    def trl_disc(analysis_dir, **kw):
        r = Runner(Config(analysis_dir=str(analysis_dir), **base, **kw))
        r.setup()
        events = r.run()
        trls = [e for e in events if e.sv_type == "trl"]
        assert len(trls) == 1
        return trls[0].disc_read_count

    off = trl_disc(work / "an_off")
    on = trl_disc(work / "an_on", global_disc_support=True)
    assert off == 4   # region map: the 4 in-window anchored pairs
    assert on == 7    # global map adds the 3 out-of-window pairs
    # batched path uses the same map — identical counts
    on_b = trl_disc(work / "an_on_b", global_disc_support=True,
                    batch_regions=True)
    assert on_b == on


def test_e2e_batched_nprocs_identical(run_events, tmp_path):
    """nprocs>1 (host worker threads over extract/assemble/classify) must
    be byte-identical to the single-threaded batched path — every
    cross-region ordering decision stays on the main thread (runner
    _run_batched; reference Pool(nprocs), SURVEY.md §2 #19)."""
    work, cfg, INS = run_events[:3]
    cfg2 = Config(**{**cfg.__dict__,
                     "batch_regions": True,
                     "nprocs": 4,
                     "analysis_dir": str(tmp_path / "analysis_np4")})
    runner = Runner(cfg2)
    runner.setup()
    runner.run()
    serial = read_svs_out(Path(cfg.analysis_dir) / "output" / "e2e_svs.out")
    np4 = read_svs_out(Path(cfg2.analysis_dir) / "output" / "e2e_svs.out")
    assert np4 == serial
    # the ledger rows (per-region calls, stats) must also agree with a
    # fresh nprocs=1 batched run, not just the aggregate table
    cfg1 = Config(**{**cfg.__dict__,
                     "batch_regions": True,
                     "nprocs": 1,
                     "analysis_dir": str(tmp_path / "analysis_np1")})
    r1 = Runner(cfg1)
    r1.setup()
    r1.run()
    def rows(d):
        led = json.loads((Path(d) / "ledger.json").read_text())
        return {k: (v["rows"], v["stats"]) for k, v in led.items()}
    assert rows(cfg2.analysis_dir) == rows(cfg1.analysis_dir)


def test_e2e_kmer_rpb_identical(run_events, tmp_path):
    """Calls and ledger rows must be invariant to the kmer launch packing
    granularity (kmer_regions_per_batch is a pure launch-scheduling knob;
    per-region postprocess makes results independent of grouping)."""
    work, cfg, INS = run_events[:3]

    def run_rpb(rpb):
        c = Config(**{**cfg.__dict__,
                      "batch_regions": True,
                      "kmer_regions_per_batch": rpb,
                      "analysis_dir": str(tmp_path / f"an_rpb{rpb}")})
        r = Runner(c)
        r.setup()
        r.run()
        out = read_svs_out(Path(c.analysis_dir) / "output" / "e2e_svs.out")
        led = json.loads((Path(c.analysis_dir) / "ledger.json").read_text())
        return out, {k: (v["rows"], v["stats"]) for k, v in led.items()}

    out1, led1 = run_rpb(1)
    out32, led32 = run_rpb(32)
    assert out1 == out32
    assert led1 == led32


def test_e2e_bam_input(run_events, tmp_path):
    """Same panel through the BAM path: convert the SAM fixture to BAM and
    expect identical calls (config #1's 'bundled test BAM reads')."""
    work, cfg, INS = run_events[:3]
    from breakmer_tpu.io.bam import write_bam
    from breakmer_tpu.io.fasta import read_fasta
    from breakmer_tpu.io.sam import parse_sam_line

    genome = read_fasta(cfg.reference_fasta)
    refs = [(name, len(seq)) for name, seq in genome.items()]
    records = []
    with open(cfg.sample_bam_file) as fh:
        for line in fh:
            if not line.startswith("@"):
                records.append(parse_sam_line(line))
    bam_path = tmp_path / "sample.bam"
    write_bam(bam_path, refs, records)

    cfg2 = Config(**{**cfg.__dict__,
                     "sample_bam_file": str(bam_path),
                     "analysis_dir": str(tmp_path / "analysis_bam")})
    runner = Runner(cfg2)
    runner.setup()
    events = runner.run()
    sam_out = read_svs_out(Path(cfg.analysis_dir) / "output" / "e2e_svs.out")
    bam_out = read_svs_out(Path(cfg2.analysis_dir) / "output" / "e2e_svs.out")
    assert bam_out == sam_out  # bit-identical calls through either ingest


def test_e2e_indexed_bam_no_preload(run_events, tmp_path):
    """Whole-genome-BAM mode: coordinate-sorted indexed BAM, preload off —
    each region is fetched through the BAI and the calls are identical to
    the preloaded SAM run (cross-path identity)."""
    work, cfg, INS = run_events[:3]
    from breakmer_tpu.io.bam import write_bam
    from breakmer_tpu.io.fasta import read_fasta
    from breakmer_tpu.io.sam import parse_sam_line

    genome = read_fasta(cfg.reference_fasta)
    refs = [(name, len(seq)) for name, seq in genome.items()]
    rid = {name: i for i, (name, _l) in enumerate(refs)}
    records = []
    with open(cfg.sample_bam_file) as fh:
        for line in fh:
            if not line.startswith("@"):
                records.append(parse_sam_line(line))
    records.sort(key=lambda r: (rid.get(r.rname, len(rid)), r.pos))
    bam_path = tmp_path / "sorted.bam"
    write_bam(bam_path, refs, records, index=True)
    assert (tmp_path / "sorted.bam.bai").exists()

    cfg2 = Config(**{**cfg.__dict__,
                     "sample_bam_file": str(bam_path),
                     "preload_alignments": False,
                     "analysis_dir": str(tmp_path / "analysis_bai")})
    runner = Runner(cfg2)
    runner.setup()
    runner.run()
    assert runner._indexed_reader is not None  # the BAI path actually ran
    sam_out = read_svs_out(Path(cfg.analysis_dir) / "output" / "e2e_svs.out")
    bai_out = read_svs_out(Path(cfg2.analysis_dir) / "output" / "e2e_svs.out")
    key = lambda r: (r["genes"], r["sv_type"], r["sv_subtype"],
                     r["target_breakpoints"], r["contig_seq"])
    assert sorted(bai_out, key=key) == sorted(sam_out, key=key)


def test_e2e_sharded_genome_index_identical(panel, tmp_path):
    """Full run with the mesh-sharded genome index (8 virtual CPU
    devices) must produce byte-identical calls to the replicated index
    (cross-path identity; SURVEY.md §2b index sharding v2)."""
    work, cfg, _ = panel
    base = Runner(Config(**{**cfg.__dict__,
                            "analysis_dir": str(tmp_path / "rep")}))
    base.setup()
    ref_events = base.run()

    r2 = Runner(Config(**{**cfg.__dict__,
                          "analysis_dir": str(tmp_path / "shard"),
                          "shard_genome_index": True}))
    r2.setup()
    from breakmer_tpu.parallel.index_shard import ShardedGenomeIndex
    assert isinstance(r2.genome, ShardedGenomeIndex)
    got_events = r2.run()
    assert [event_row(e) for e in got_events] == [event_row(e) for e in ref_events]


def _olc_pipeline_contigs(tmp_path, olc_merge):
    """Drive one region whose 150bp inversion junctions assemble as two
    contigs (interior k-mers are reference revcomp — no greedy chaining)
    that overlap textually inside the inverted segment."""
    import numpy as np

    from breakmer_tpu.align.realign import RegionRef
    from breakmer_tpu.encode import encode_seq
    from breakmer_tpu.io.bed import TargetRegion
    from breakmer_tpu.io.sam import read_sam
    from breakmer_tpu.pipeline import TargetPipeline

    genome = {"chr1": rand_seq(77, 6000)}
    hap = Haplotype(genome, [
        RefBlock("chr1", 2100, 2500),
        RefBlock("chr1", 2500, 2650, strand="-"),
        RefBlock("chr1", 2650, 3100),
    ])
    sam = SamBuilder(genome)
    sam.add_haplotype_reads(hap, 0, len(hap.seq), prefix="inv")
    sam.add_background_pairs("chr1", 1900, 3300)
    path = tmp_path / f"olc_{olc_merge}.sam"
    sam.write(path)
    cfg = Config(rearr_sr_thresh=2, trl_sr_thresh=2,
                 olc_merge=olc_merge)
    target = TargetRegion("INV", "chr1", 2000, 3200, [])
    chrom, start, end = target.span(cfg.region_buffer)
    ref_codes = encode_seq(genome["chr1"][start:end])
    pipe = TargetPipeline(cfg, target, RegionRef.build(chrom, start, ref_codes,
                                                      cfg.seed_kmer_size))
    result = pipe.run(records=list(read_sam(path)))
    assert result.error is None, result.error
    return result


def test_olc_merge_joins_split_junction_contigs(tmp_path):
    """VERDICT r1 #5: with OLC merging, the two junction contigs of one
    inversion fuse into a single contig spanning both junctions, and the
    event is called once from the 3-segment path; without it the
    junctions stay split across two contigs."""
    split = _olc_pipeline_contigs(tmp_path, olc_merge=False)
    merged = _olc_pipeline_contigs(tmp_path, olc_merge=True)
    assert len(split.contigs) >= 2, [c.id for c in split.contigs]
    assert len(merged.contigs) == 1, [c.id for c in merged.contigs]
    # the merged contig carries the union of the supporting reads
    assert merged.contigs[0].nreads >= max(c.nreads for c in split.contigs)
    invs = [e for e in merged.events if e.sv_subtype == "inversion"]
    assert len(invs) == 1, [(e.sv_type, e.sv_subtype) for e in merged.events]
    positions = [p for (c, s_, e_) in invs[0].breakpoints
                 for p in (s_, e_) if p is not None]
    assert any(abs(p - 2500) <= 12 for p in positions), positions
    assert any(abs(p - 2650) <= 12 for p in positions), positions


def test_batched_with_normal_matches_serial(tmp_path):
    """VERDICT r1 #7: a panel with a matched normal now runs through the
    BATCHED path (in-device normal subtraction in the packed launches)
    and produces byte-identical calls to the serial path — germline
    events subtracted, somatic events kept."""
    work = tmp_path
    genome = {"chr1": rand_seq(404, 9000)}
    write_fasta(work / "genome.fa", genome)
    (work / "targets.bed").write_text(
        "chr1\t800\t1400\tSOM\nchr1\t3000\t3600\tGERM\n"
        "chr1\t5000\t5600\tCLEAN\nchr1\t7000\t7600\tSOM2\n")
    INS1 = "TTGACCATGGATCCGGTACAT"
    INS2 = "GGCATTACCGAGGTTGACCAA"
    hap_som = Haplotype(genome, [
        RefBlock("chr1", 800, 1100), NovelBlock(INS1), RefBlock("chr1", 1100, 1400)])
    hap_germ = Haplotype(genome, [
        RefBlock("chr1", 3000, 3300), NovelBlock(INS2), RefBlock("chr1", 3300, 3600)])
    hap_som2 = Haplotype(genome, [
        RefBlock("chr1", 7000, 7280), RefBlock("chr1", 7340, 7600)])  # 60bp del
    sam = SamBuilder(genome)
    sam.add_haplotype_reads(hap_som, 180, 440, prefix="s1")
    sam.add_haplotype_reads(hap_germ, 180, 440, prefix="s2")
    sam.add_haplotype_reads(hap_som2, 160, 420, prefix="s3")
    for s, e in ((600, 1600), (2800, 3800), (4800, 5800), (6800, 7800)):
        sam.add_background_pairs("chr1", s, e)
    sam.write(work / "sample.sam")
    nsam = SamBuilder(genome)
    nsam.add_haplotype_reads(hap_germ, 180, 440, prefix="n")
    nsam.write(work / "normal.sam")

    base = dict(
        analysis_name="bn", targets_bed_file=str(work / "targets.bed"),
        reference_fasta=str(work / "genome.fa"),
        sample_bam_file=str(work / "sample.sam"),
        normal_bam_file=str(work / "normal.sam"),
        indel_sr_thresh=2,
    )

    def rows(analysis_dir):
        out = Path(analysis_dir) / "output" / "bn_svs.out"
        return [l for l in out.read_text().splitlines()
                if l.strip() and not l.startswith("genes")]

    r1 = Runner(Config(analysis_dir=str(work / "serial"), **base))
    r1.setup()
    serial_events = r1.run()
    r2 = Runner(Config(analysis_dir=str(work / "batched"),
                       batch_regions=True, **base))
    r2.setup()
    batched_events = r2.run()
    assert {e.genes for e in serial_events} == {"SOM", "SOM2"}
    assert rows(work / "serial") == rows(work / "batched")


def test_e2e_batched_packed_overflow_fallback(run_events, tmp_path, monkeypatch):
    """Force the packed kmer fetch to overflow (1 slot/region) so every
    batch takes the full-shape refetch fallback — calls must still equal
    the serial path exactly."""
    import breakmer_tpu.parallel.kmer_batch as KB

    monkeypatch.setattr(KB, "_PACK_SLOTS_PER_REGION", 1)
    work, cfg, INS = run_events[:3]
    cfg2 = Config(**{**cfg.__dict__,
                     "batch_regions": True,
                     "analysis_dir": str(tmp_path / "analysis_overflow")})
    runner = Runner(cfg2)
    runner.setup()
    runner.run()
    serial = read_svs_out(Path(cfg.analysis_dir) / "output" / "e2e_svs.out")
    batched = read_svs_out(Path(cfg2.analysis_dir) / "output" / "e2e_svs.out")
    assert batched == serial
