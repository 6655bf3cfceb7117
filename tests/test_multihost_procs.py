"""REAL two-process multihost e2e: two OS processes coordinate through
jax.distributed.initialize (CPU backend), each runs its region partition,
and process 0 merges the shard ledgers into one output (BASELINE.json
config #5 shape, minus real multi-chip hardware — SURVEY.md §4.4)."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from breakmer_tpu.config import Config
from breakmer_tpu.runner import Runner

work = Path(sys.argv[1]); pid = int(sys.argv[2]); port = sys.argv[3]
cfg = Config(**{**json.loads((work / "cfg.json").read_text()),
                "multihost": True, "num_processes": 2, "process_id": pid,
                "coordinator_address": f"127.0.0.1:{port}"})
r = Runner(cfg)
r.setup()
assert r.process_count == 2 and r.process_index == pid
r.run()
print(f"WORKER_OK {pid} {len(r.targets)}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(280)
def test_two_process_multihost_run(tmp_path):
    sys.path.insert(0, "/root/repo")
    import bench_panel as bp

    cfg = bp.build_panel(tmp_path, 6, 10)
    (tmp_path / "cfg.json").write_text(json.dumps(cfg.__dict__))
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    import os

    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site",
               JAX_PLATFORMS="")
    # _free_port closes its probe socket before the coordinator rebinds,
    # so a concurrent process can steal the port between the two binds —
    # retry the whole two-process spawn once on a fresh port
    for attempt in (0, 1):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker_py), str(tmp_path), str(p), str(port)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for p in (0, 1)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=240)
                outs.append(out)
        except subprocess.TimeoutExpired:
            # kill BOTH workers (a hung pair would otherwise leak two
            # processes + the coordinator port for the rest of the session)
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
                pytest.fail("multihost workers hung twice: " + outs[0][-2000:])
            continue
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "WORKER_OK 0 3" in outs[0]
    assert "WORKER_OK 1 3" in outs[1]
    svs = Path(cfg.analysis_dir) / "output" / "panelbench_svs.out"
    assert svs.exists()
    rows = [
        l for l in svs.read_text().splitlines()
        if l.strip() and not l.startswith("genes")
    ]
    # planted insertion in every even gene of 6 -> 3 calls, merged in
    # panel order by process 0 from both shards
    assert len(rows) == 3
    called_genes = [r.split("\t")[0] for r in rows]
    assert called_genes == ["GENE0", "GENE2", "GENE4"]
