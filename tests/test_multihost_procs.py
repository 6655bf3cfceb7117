"""REAL multi-process multihost e2e (BASELINE.json config #5 shape, minus
real multi-chip hardware — SURVEY.md §4.4): N OS processes coordinate
through jax.distributed.initialize (CPU backend), each runs its region
partition, and process 0 merges the shard ledgers into one output.

r4 (VERDICT r3 missing #5): N=4 with an UNEVEN region split (6 genes over
4 procs -> partitions 2/2/1/1), and a fault/resume scenario — every
worker dies abruptly (os._exit) after checkpointing one region, the rerun
resumes from the shard ledgers, and the merged output is byte-identical
to a single-process run of the same panel (the cross-path identity the
shard ledger exists to guarantee)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

# argv: work_dir process_id port num_processes die_after(-1=never) resume(0/1)
WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from breakmer_tpu.config import Config
from breakmer_tpu.runner import Runner

work = Path(sys.argv[1]); pid = int(sys.argv[2]); port = sys.argv[3]
nprocs = int(sys.argv[4]); die_after = int(sys.argv[5])
resume = bool(int(sys.argv[6]))
cfg = Config(**{**json.loads((work / "cfg.json").read_text()),
                "multihost": True, "num_processes": nprocs,
                "process_id": pid,
                "coordinator_address": f"127.0.0.1:{port}"})
r = Runner(cfg)
r.setup()
assert r.process_count == nprocs and r.process_index == pid
if die_after >= 0:
    # abrupt death (no cleanup, no snapshot) after N region checkpoints —
    # the shard ledger JSONL is all the rerun gets to resume from
    orig = r._append_ledger
    state = {"n": 0}
    def dying(name, entry):
        orig(name, entry)
        state["n"] += 1
        if state["n"] > die_after:
            os._exit(17)
    r._append_ledger = dying
pre = len(r._load_ledger()) if resume else 0
r.run(resume=resume)
print(f"WORKER_OK {pid} {len(r.targets)} resumed={pre}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(work: Path, nprocs: int, die_after: int = -1, resume: bool = False,
           timeout: int = 240, ok_codes=(0,)):
    """Launch the worker script as nprocs OS processes; returns
    (procs, outs). Retries once on a fresh port (the _free_port probe
    socket closes before the coordinator rebinds, so a concurrent
    process can steal it between the two binds). ``ok_codes`` lists the
    EXPECTED returncodes — anything else (e.g. a port-clash distributed
    init error) triggers the retry even in fault-injection runs."""
    worker_py = work / "worker.py"
    worker_py.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site",
               JAX_PLATFORMS="")
    for attempt in (0, 1):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker_py), str(work), str(p),
                 str(port), str(nprocs), str(die_after),
                 str(int(resume))],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for p in range(nprocs)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout)
                outs.append(out)
        except subprocess.TimeoutExpired:
            outs = []
            for p in procs:
                if p.poll() is None:
                    p.kill()
                try:
                    out, _ = p.communicate(timeout=10)
                except Exception:
                    out = ""
                outs.append((out or "") + "\n[TIMEOUT: worker killed]")
            if attempt == 1:
                pytest.fail("multihost workers hung twice: "
                            + outs[0][-2000:])
            continue
        ok = all(p.returncode in ok_codes for p in procs)
        if ok or attempt == 1:
            break
    return procs, outs


def _svs_rows(path: Path):
    return [
        l for l in path.read_text().splitlines()
        if l.strip() and not l.startswith("genes")
    ]


@pytest.mark.timeout(280)
def test_two_process_multihost_run(tmp_path):
    sys.path.insert(0, "/root/repo")
    import bench_panel as bp

    cfg = bp.build_panel(tmp_path, 6, 10)
    (tmp_path / "cfg.json").write_text(json.dumps(cfg.__dict__))
    procs, outs = _spawn(tmp_path, nprocs=2)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "WORKER_OK 0 3" in outs[0]
    assert "WORKER_OK 1 3" in outs[1]
    svs = Path(cfg.analysis_dir) / "output" / "panelbench_svs.out"
    assert svs.exists()
    rows = _svs_rows(svs)
    # planted insertion in every even gene of 6 -> 3 calls, merged in
    # panel order by process 0 from both shards
    assert len(rows) == 3
    called_genes = [r.split("\t")[0] for r in rows]
    assert called_genes == ["GENE0", "GENE2", "GENE4"]


@pytest.mark.timeout(280)
def test_four_process_uneven_split(tmp_path):
    """6 regions over 4 processes: round-robin partitions are UNEVEN
    (2/2/1/1) and the merge must still produce the full panel in order
    (VERDICT r3 missing #5)."""
    sys.path.insert(0, "/root/repo")
    import bench_panel as bp

    cfg = bp.build_panel(tmp_path, 6, 10)
    (tmp_path / "cfg.json").write_text(json.dumps(cfg.__dict__))
    procs, outs = _spawn(tmp_path, nprocs=4)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    for pid, want in ((0, 2), (1, 2), (2, 1), (3, 1)):
        assert f"WORKER_OK {pid} {want}" in outs[pid], outs[pid][-800:]
    rows = _svs_rows(Path(cfg.analysis_dir) / "output"
                     / "panelbench_svs.out")
    assert [r.split("\t")[0] for r in rows] == ["GENE0", "GENE2", "GENE4"]


@pytest.mark.timeout(280)
def test_worker_death_then_ledger_resume(tmp_path):
    """Fault scenario the shard ledger exists for: every worker dies
    abruptly (os._exit, no snapshot) after checkpointing ONE region; the
    rerun with resume=True picks the finished regions up from the shard
    JSONL logs and the merged output is byte-identical to a
    single-process run (VERDICT r3 missing #5)."""
    sys.path.insert(0, "/root/repo")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench_panel as bp
    from breakmer_tpu.config import Config
    from breakmer_tpu.runner import Runner

    (tmp_path / "mh").mkdir()
    cfg = bp.build_panel(tmp_path / "mh", 4, 10)
    (tmp_path / "mh" / "cfg.json").write_text(json.dumps(cfg.__dict__))

    # run 1: both workers die after their first region checkpoint
    procs, outs = _spawn(tmp_path / "mh", nprocs=2, die_after=0,
                         ok_codes=(17,))
    assert all(p.returncode == 17 for p in procs), [
        (p.returncode, o[-400:]) for p, o in zip(procs, outs)
    ]
    # each shard has exactly its first region checkpointed, no merge ran
    for pid in (0, 1):
        ap = Path(cfg.analysis_dir) / f"ledger_p{pid}.jsonl"
        assert ap.exists()
        assert len([l for l in ap.read_text().splitlines()
                    if l.strip()]) == 1
    assert not (Path(cfg.analysis_dir) / "output"
                / "panelbench_svs.out").exists()

    # run 2: resume — finished regions come from the ledger shards
    procs, outs = _spawn(tmp_path / "mh", nprocs=2, resume=True)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "WORKER_OK 0 2 resumed=1" in outs[0], outs[0][-800:]
    assert "WORKER_OK 1 2 resumed=1" in outs[1], outs[1][-800:]
    mh_out = (Path(cfg.analysis_dir) / "output"
              / "panelbench_svs.out").read_bytes()

    # reference: the same panel end-to-end in ONE process
    (tmp_path / "solo").mkdir()
    solo = bp.build_panel(tmp_path / "solo", 4, 10)
    r = Runner(solo)
    r.setup()
    r.run()
    solo_out = (Path(solo.analysis_dir) / "output"
                / "panelbench_svs.out").read_bytes()
    assert mh_out == solo_out
