"""Multi-host partition/merge logic with simulated process counts
(SURVEY.md §4.4 — no cluster exists; the seams are tested directly and
the degenerate 1-process path runs end-to-end)."""

import json
from pathlib import Path

from breakmer_tpu.parallel.multihost import (
    merge_ledger_shards, partition_targets, shard_ledger_path,
)


def test_partition_round_robin():
    names = [f"G{i}" for i in range(10)]
    parts = [partition_targets(names, p, 4) for p in range(4)]
    assert parts[0] == ["G0", "G4", "G8"]
    assert parts[1] == ["G1", "G5", "G9"]
    # complete and disjoint
    flat = [n for part in parts for n in part]
    assert sorted(flat) == sorted(names)
    assert len(set(flat)) == len(names)


def test_partition_single_process_is_identity():
    names = ["A", "B", "C"]
    assert partition_targets(names, 0, 1) == names


def test_merge_ledger_shards(tmp_path):
    names = [f"G{i}" for i in range(7)]
    pcount = 3
    for p in range(pcount):
        shard = {
            n: {"rows": [[n, "chr1:1", "10M", "0", "+", "10", "indel", "I",
                          "3", "0", "5", f"{n}_c1", "ACGT"]]}
            for n in partition_targets(names, p, pcount)
        }
        shard_ledger_path(tmp_path, p).write_text(json.dumps(shard))
    merged = merge_ledger_shards(tmp_path, names, pcount, wait_timeout_s=5)
    assert set(merged) == set(names)
    # rows preserved per target
    assert merged["G3"]["rows"][0][0] == "G3"


def test_merge_tolerates_missing_shard(tmp_path):
    names = ["A", "B"]
    shard_ledger_path(tmp_path, 0).write_text(json.dumps({"A": {"rows": []}}))
    # shard 1 never appears; merge times out but returns what exists
    merged = merge_ledger_shards(tmp_path, names, 2, wait_timeout_s=1, poll_s=0.2)
    assert "A" in merged and "B" not in merged


def test_e2e_multihost_single_process(tmp_path):
    """Degenerate 1-process multihost run produces the same calls as a
    plain run (real >1-process needs hardware; seams above are unit
    tested)."""
    from breakmer_tpu.config import Config
    from breakmer_tpu.io.fasta import write_fasta
    from breakmer_tpu.report import read_svs_out
    from breakmer_tpu.runner import Runner
    from tests.fixtures import Haplotype, NovelBlock, RefBlock, SamBuilder, rand_seq

    genome = {"chr1": rand_seq(404, 3000)}
    write_fasta(tmp_path / "genome.fa", genome)
    (tmp_path / "targets.bed").write_text("chr1\t800\t1400\tMH1\n")
    INS = "TTGACCATGGATCCGGTACAT"
    hap = Haplotype(genome, [
        RefBlock("chr1", 800, 1100), NovelBlock(INS), RefBlock("chr1", 1100, 1400),
    ])
    sam = SamBuilder(genome)
    sam.add_haplotype_reads(hap, 180, 440)
    sam.add_background_pairs("chr1", 600, 1600)
    sam.write(tmp_path / "sample.sam")
    base = dict(
        analysis_name="mh", targets_bed_file=str(tmp_path / "targets.bed"),
        reference_fasta=str(tmp_path / "genome.fa"),
        sample_bam_file=str(tmp_path / "sample.sam"), indel_sr_thresh=2,
    )
    r1 = Runner(Config(analysis_dir=str(tmp_path / "plain"), **base))
    r1.setup()
    r1.run()
    r2 = Runner(Config(analysis_dir=str(tmp_path / "mh"), multihost=True, **base))
    r2.setup()
    assert (r2.process_index, r2.process_count) == (0, 1)
    r2.run()
    plain = read_svs_out(Path(tmp_path) / "plain" / "output" / "mh_svs.out")
    mh = read_svs_out(Path(tmp_path) / "mh" / "output" / "mh_svs.out")
    assert mh == plain and len(mh) == 1
    assert shard_ledger_path(tmp_path / "mh", 0).exists()


def test_ledger_append_log_resume(tmp_path):
    """A run interrupted before finalize leaves only the JSONL append
    log; _load_ledger must overlay it (crash-safe region checkpoints)."""
    from breakmer_tpu.config import Config
    from breakmer_tpu.runner import Runner

    cfg = Config(analysis_name="x", analysis_dir=str(tmp_path),
                 targets_bed_file="unused", reference_fasta="unused",
                 sample_bam_file="unused")
    r = Runner(cfg)
    r.process_index, r.process_count = 0, 1
    r._append_ledger("GENE0", {"rows": [], "error": None})
    r._append_ledger("GENE1", {"rows": [["a"]], "error": None})
    r._append_ledger("GENE1", {"rows": [["b"]], "error": None})  # re-run wins
    assert not (tmp_path / "ledger.json").exists()
    led = r._load_ledger()
    assert set(led) == {"GENE0", "GENE1"}
    assert led["GENE1"]["rows"] == [["b"]]
    # finalize-style snapshot consolidates and clears the log
    r._save_ledger(led)
    assert (tmp_path / "ledger.json").exists()
    assert not (tmp_path / "ledger.jsonl").exists()
    assert r._load_ledger() == led
