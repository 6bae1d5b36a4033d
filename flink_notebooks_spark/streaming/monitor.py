"""Job/query monitoring (SURVEY.md T6/T7).

The reference polls the Flink REST API for job states, per-vertex info, and
metrics like numRecordsIn/Out (reference vscode-extension/src/services/
flinkJobClient.ts:7-17,107-128,180-188; jobMonitorProvider.ts:90-144,
361-391). Spark equivalents: ``spark.streams.active`` + per-query
``status``/``lastProgress`` for streaming, and the SparkContext status
tracker for batch jobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

# Flink's job states (flinkJobClient.ts:7-17) → what Spark exposes
RUNNING = "RUNNING"
FINISHED = "FINISHED"
FAILED = "FAILED"
CANCELED = "CANCELED"


@dataclass
class JobInfo:
    job_id: str
    name: str
    state: str
    duration_ms: int
    metrics: dict[str, float] = field(default_factory=dict)
    detail: dict = field(default_factory=dict)


class JobMonitor:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def streaming_jobs(self) -> list[JobInfo]:
        jobs = []
        for q in self.spark.streams.active:
            prog = q.lastProgress or {}
            dur = int(prog.get("batchDuration", 0))
            metrics = {
                # numRecordsIn/Out parity (jobMonitorProvider.ts:361-391)
                "numRecordsIn": float(prog.get("numInputRows", 0) or 0),
                "inputRowsPerSecond": float(prog.get("inputRowsPerSecond", 0) or 0),
                "processedRowsPerSecond": float(prog.get("processedRowsPerSecond", 0) or 0),
                "batchId": float(prog.get("batchId", -1)),
            }
            state_rows = prog.get("stateOperators") or []
            if state_rows:
                metrics["numStateRows"] = float(
                    sum(s.get("numRowsTotal", 0) for s in state_rows)
                )
            jobs.append(
                JobInfo(
                    job_id=q.id,
                    name=q.name or q.id,
                    state=RUNNING if q.isActive else FINISHED,
                    duration_ms=dur,
                    metrics=metrics,
                    detail={"statusMessage": q.status.get("message", "")},
                )
            )
        return jobs

    def batch_jobs(self) -> list[JobInfo]:
        st = self.spark.sparkContext.statusTracker()
        jobs = []
        for jid in st.getActiveJobsIds():
            info = st.getJobInfo(jid)
            if info is None:
                continue
            jobs.append(
                JobInfo(
                    job_id=str(jid),
                    name=f"job-{jid}",
                    state=str(info.status),
                    duration_ms=0,
                    detail={"stageIds": list(info.stageIds)},
                )
            )
        return jobs

    def overview(self) -> dict[str, list[JobInfo]]:
        """Grouped view like the reference's job monitor tree
        (jobMonitorProvider.ts:90-144)."""
        out: dict[str, list[JobInfo]] = {}
        for j in self.streaming_jobs() + self.batch_jobs():
            out.setdefault(j.state, []).append(j)
        return out

    def cancel(self, job_id: str) -> bool:
        """PATCH /jobs/{id}?mode=cancel equivalent (flinkJobClient.ts:164-175)."""
        for q in self.spark.streams.active:
            if q.id == job_id or (q.name or "") == job_id:
                q.stop()
                return True
        return False
