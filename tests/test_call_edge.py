"""Edge-shape calling tests: novel-insert junction subtype, gene-list
restriction, two-segment inversion."""

import random
from pathlib import Path

from breakmer_tpu.align import realign_contig
from breakmer_tpu.align.realign import RegionRef
from breakmer_tpu.call import classify_contig
from breakmer_tpu.config import Config
from breakmer_tpu.encode import encode_seq, revcomp
from tests.test_call import _cfg, _contig_with_reads


def _rand(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_classify_large_novel_insertion_as_ins():
    """A novel middle longer than max_q_gap splits the alignment; the
    junction with contiguous target and a large query gap is subtype
    'ins' (rearrangement)."""
    ref = _rand(31, 800)
    novel = _rand(777, 120)  # 120bp novel sequence, nowhere in ref
    contig_seq = ref[200:320] + novel + ref[320:440]
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref)))
    assert len(segs) == 2
    events = classify_contig(contig, segs, "G", _cfg())
    ins = [e for e in events if e.sv_subtype == "ins"]
    assert len(ins) == 1
    assert abs(ins[0].size - 120) <= 5
    assert abs(ins[0].breakpoints[0][1] - 320) <= 5


def test_classify_two_segment_inversion():
    """Contig = forward arm + inverted arm (no trailing forward segment):
    single junction with a strand flip -> inversion."""
    ref = _rand(32, 800)
    contig_seq = ref[100:250] + revcomp(ref[500:650])
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref)))
    assert len(segs) == 2
    assert {s.strand for s in segs} == {"+", "-"}
    events = classify_contig(contig, segs, "G", _cfg())
    invs = [e for e in events if e.sv_subtype == "inversion"]
    assert len(invs) == 1


def test_gene_list_restriction(tmp_path):
    from breakmer_tpu.io.fasta import write_fasta
    from breakmer_tpu.runner import Runner
    from tests.fixtures import SamBuilder, rand_seq

    genome = {"chr1": rand_seq(55, 3000)}
    write_fasta(tmp_path / "genome.fa", genome)
    (tmp_path / "targets.bed").write_text(
        "chr1\t500\t900\tKEEP\nchr1\t1500\t1900\tSKIP\n")
    (tmp_path / "genes.txt").write_text("KEEP\n")
    sam = SamBuilder(genome)
    sam.add_background_pairs("chr1", 300, 2100)
    sam.write(tmp_path / "sample.sam")
    cfg = Config(
        analysis_name="gl", analysis_dir=str(tmp_path / "a"),
        targets_bed_file=str(tmp_path / "targets.bed"),
        reference_fasta=str(tmp_path / "genome.fa"),
        sample_bam_file=str(tmp_path / "sample.sam"),
        gene_list=str(tmp_path / "genes.txt"),
    )
    runner = Runner(cfg)
    runner.setup()
    assert list(runner.targets) == ["KEEP"]
    runner.run()
    import json

    ledger = json.loads((Path(cfg.analysis_dir) / "ledger.json").read_text())
    assert set(ledger) == {"KEEP"}
