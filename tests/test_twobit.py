import numpy as np
import pytest

from breakmer_tpu.io.twobit import TwoBitReader, write_2bit
from tests.fixtures import rand_seq


def test_twobit_roundtrip(tmp_path):
    seqs = {
        "chr1": rand_seq(1, 1000),
        "chr2": "ACGT" * 10 + "N" * 25 + "TTGGCCAA" * 5 + "N" * 3 + "ACGT",
    }
    path = tmp_path / "g.2bit"
    write_2bit(path, seqs)
    reader = TwoBitReader(path)
    assert reader.names == ["chr1", "chr2"]
    for name, seq in seqs.items():
        assert reader.length(name) == len(seq)
        assert reader.fetch(name, 0, len(seq)) == seq


def test_twobit_slices(tmp_path):
    seq = rand_seq(2, 503)  # odd length exercises byte-boundary logic
    path = tmp_path / "g.2bit"
    write_2bit(path, {"c": seq})
    reader = TwoBitReader(path)
    for start, end in [(0, 10), (1, 9), (2, 503), (3, 250), (499, 503), (251, 252)]:
        assert reader.fetch("c", start, end) == seq[start:end], (start, end)
    # clamping
    assert reader.fetch("c", -5, 4) == seq[:4]
    assert reader.fetch("c", 500, 900) == seq[500:]
    assert reader.fetch("c", 10, 5) == ""


def test_twobit_n_blocks_across_slice(tmp_path):
    seq = "ACGT" * 5 + "N" * 10 + "GGCC" * 5
    path = tmp_path / "g.2bit"
    write_2bit(path, {"c": seq})
    reader = TwoBitReader(path)
    assert reader.fetch("c", 15, 35) == seq[15:35]
    codes = reader.fetch_codes("c", 18, 32)
    assert (codes[2:12] == 4).all()


def test_twobit_bad_file(tmp_path):
    p = tmp_path / "bad.2bit"
    p.write_bytes(b"NOT A 2BIT FILE!")
    with pytest.raises(ValueError, match="2bit"):
        TwoBitReader(p)


def test_runner_accepts_2bit(tmp_path):
    """reference_fasta may point at a .2bit file (migration compat)."""
    from breakmer_tpu.config import Config
    from breakmer_tpu.runner import Runner
    from tests.fixtures import Haplotype, NovelBlock, RefBlock, SamBuilder

    genome = {"chr1": rand_seq(61, 3000)}
    write_2bit(tmp_path / "genome.2bit", genome)
    (tmp_path / "targets.bed").write_text("chr1\t800\t1400\tTB\n")
    INS = "TTGACCATGGATCCGGTACAT"
    hap = Haplotype(genome, [
        RefBlock("chr1", 800, 1100), NovelBlock(INS), RefBlock("chr1", 1100, 1400),
    ])
    sam = SamBuilder(genome)
    sam.add_haplotype_reads(hap, 180, 440)
    sam.add_background_pairs("chr1", 600, 1600)
    sam.write(tmp_path / "sample.sam")
    cfg = Config(
        analysis_name="tb", analysis_dir=str(tmp_path / "a"),
        targets_bed_file=str(tmp_path / "targets.bed"),
        reference_fasta=str(tmp_path / "genome.2bit"),
        sample_bam_file=str(tmp_path / "sample.sam"), indel_sr_thresh=2,
    )
    runner = Runner(cfg)
    runner.setup()
    events = runner.run()
    assert len(events) == 1
    assert (events[0].sv_type, events[0].sv_subtype) == ("indel", "I")
