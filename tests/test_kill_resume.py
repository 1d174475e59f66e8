"""Kill-resume integration (SURVEY §5 item 4 / r02 verdict next-step #7).

Launch the real pipeline (job.py) in a subprocess against a workdir,
SIGKILL the whole process group mid-DAG once some stage manifests exist,
then resume in-process and assert: pre-kill stages report resumed=True
(zero recompute — their manifests satisfy run_stage before any upstream
plan is built), the killed in-flight stage is NOT half-trusted, and the
final triples are byte-identical to an uninterrupted clean run. Both
checkpoint modes are exercised: parquet+manifest and Iceberg-lite
snapshot tables.
"""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 40


def _manifests(workdir: str, use_snapshots: bool) -> set[str]:
    if use_snapshots:
        hints = glob.glob(f"{workdir}/*/metadata/version-hint.text")
        return {p.split("/")[-3] for p in hints}
    return {
        os.path.basename(os.path.dirname(p))
        for p in glob.glob(f"{workdir}/*/_kargo_manifest.json")
    }


def _launch_and_kill(workdir: str, use_snapshots: bool, min_stages: int = 2) -> set[str]:
    """Start job.py detached; SIGKILL its process group (driver + JVM) as
    soon as min_stages stage checkpoints exist. Returns the completed
    stage names at kill time."""
    # --cluster-relations aligns the subprocess config with the resume
    # run's run_pipeline defaults (same stage list + params), so even a
    # late-landing kill cannot leave a checkpoint computed under a
    # different configuration
    cmd = [
        sys.executable, os.path.join(REPO, "job.py"),
        "--synth", str(N_DOCS), "--workdir", workdir, "--cluster-relations",
    ]
    if use_snapshots:
        cmd.append("--use-snapshots")
    proc = subprocess.Popen(
        cmd, cwd=REPO, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            done = _manifests(workdir, use_snapshots)
            if len(done) >= min_stages:
                os.killpg(proc.pid, signal.SIGKILL)
                break
            if proc.poll() is not None:
                pytest.fail("pipeline finished before the kill could land")
            time.sleep(0.2)
        else:
            pytest.fail("no stage checkpoints appeared within 300 s")
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
    return _manifests(workdir, use_snapshots)


def _run_pipeline(spark, workdir: str, use_snapshots: bool):
    from kargo_spark.pipeline import run_pipeline
    from kargo_spark.synth import synth_documents

    docs = synth_documents(spark, n_rows=N_DOCS)
    return run_pipeline(
        spark, docs, workdir, ranker="tfidf", min_samples=3, eps=0.35,
        use_snapshots=use_snapshots,
    )


def _triples_set(out):
    return sorted(
        tuple(r) for r in out["triples"].select("subj", "pred", "obj", "support").collect()
    )


@pytest.mark.parametrize("use_snapshots", [False, True], ids=["manifest", "snapshots"])
def test_kill_mid_pipeline_then_resume(spark, tmp_path, use_snapshots):
    killed_dir = str(tmp_path / "killed")
    clean_dir = str(tmp_path / "clean")

    done_at_kill = _launch_and_kill(killed_dir, use_snapshots)
    assert done_at_kill, "kill landed before any stage completed"

    out = _run_pipeline(spark, killed_dir, use_snapshots)
    metrics = {r["stage"]: r["resumed"] for r in out["metrics"].collect()}
    # every stage checkpoint that was durable at kill time must resume
    # (zero recompute); the set can only have grown while the kill signal
    # landed, so compare against the snapshot taken at kill time
    for stage in done_at_kill:
        assert metrics.get(stage) is True, (stage, metrics)
    # at least one later stage was actually computed by the resumed run
    assert any(not v for v in metrics.values()), metrics

    clean = _run_pipeline(spark, clean_dir, use_snapshots)
    assert _triples_set(out) == _triples_set(clean)
    assert len(_triples_set(out)) > 0
