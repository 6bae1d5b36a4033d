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
    def __init__(self, spark: SparkSession, sessions=None):
        """``sessions``: optional zero-arg callable yielding extra
        SparkSessions to scan — the gateway passes its session map, since
        ``newSession()`` isolates the StreamingQueryManager per session."""
        self.spark = spark
        self._sessions = sessions

    def _active_queries(self):
        seen = set()
        sparks = [self.spark] + (list(self._sessions()) if self._sessions else [])
        for s in sparks:
            for q in s.streams.active:
                if q.id not in seen:
                    seen.add(q.id)
                    yield q

    def streaming_jobs(self) -> list[JobInfo]:
        jobs = []
        for q in self._active_queries():
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
        for q in self._active_queries():
            if q.id == job_id or (q.name or "") == job_id:
                q.stop()
                return True
        return False

    # ---- Flink JobManager REST wire shapes (flinkJobClient.ts:19-77) ------
    def _summary(self, j: JobInfo) -> dict:
        running = j.state == RUNNING
        return {
            "jid": j.job_id,
            "name": j.name,
            "state": j.state,
            "start-time": -1,
            "end-time": -1,
            "duration": j.duration_ms,
            "last-modification": -1,
            "tasks": {
                "total": 1,
                "created": 0,
                "scheduled": 0,
                "deploying": 0,
                "running": 1 if running else 0,
                "finished": 0 if running else 1,
                "canceling": 0,
                "canceled": 0,
                "failed": 1 if j.state == FAILED else 0,
            },
        }

    def _find(self, jid: str) -> JobInfo | None:
        for j in self.streaming_jobs() + self.batch_jobs():
            if j.job_id == jid or j.name == jid:
                return j
        return None

    def flink_overview(self) -> dict:
        """GET /jobs/overview shape (flinkJobClient.ts:39-41,107-110)."""
        return {"jobs": [self._summary(j) for j in self.streaming_jobs() + self.batch_jobs()]}

    def flink_details(self, jid: str) -> dict | None:
        """GET /jobs/{jid} shape (flinkJobClient.ts:55-68). Vertices map from
        the streaming query's per-source/sink progress entries."""
        j = self._find(jid)
        if j is None:
            return None
        vertices = []
        prog = {}
        for q in self._active_queries():
            if q.id == j.job_id:
                prog = q.lastProgress or {}
        for i, src in enumerate(prog.get("sources") or []):
            vertices.append(
                {
                    "id": f"{j.job_id}-src{i}",
                    "name": f"Source: {src.get('description', 'source')}"[:120],
                    "parallelism": 1,
                    "status": j.state,
                    "start-time": -1,
                    "end-time": -1,
                    "duration": j.duration_ms,
                    "tasks": {j.state: 1},
                    "metrics": {
                        "read-records": src.get("numInputRows", 0) or 0,
                    },
                }
            )
        sink = prog.get("sink")
        if sink:
            vertices.append(
                {
                    "id": f"{j.job_id}-sink",
                    "name": f"Sink: {sink.get('description', 'sink')}"[:120],
                    "parallelism": 1,
                    "status": j.state,
                    "start-time": -1,
                    "end-time": -1,
                    "duration": j.duration_ms,
                    "tasks": {j.state: 1},
                    "metrics": {
                        "write-records": sink.get("numOutputRows", 0) or 0,
                    },
                }
            )
        return {
            **self._summary(j),
            "isStoppable": True,
            "now": -1,
            "timestamps": {},
            "vertices": vertices,
            "status-counts": {j.state: 1},
        }

    def flink_metrics(self, jid: str, get: list[str] | None = None) -> list[dict] | None:
        """GET /jobs/{jid}/metrics shape (flinkJobClient.ts:70-77,131-158):
        without ?get= returns available metric ids; with it, id+value pairs."""
        j = self._find(jid)
        if j is None:
            return None
        if not get:
            return [{"id": k} for k in sorted(j.metrics)]
        return [
            {"id": k, "value": str(j.metrics[k])} for k in get if k in j.metrics
        ]

    def flink_checkpoints(self, jid: str) -> dict | None:
        """GET /jobs/{jid}/checkpoints shape (flinkJobClient.ts:178-188):
        every committed micro-batch is a completed checkpoint."""
        j = self._find(jid)
        if j is None:
            return None
        batch = int(j.metrics.get("batchId", -1))
        completed = batch + 1 if batch >= 0 else 0
        return {
            "counts": {"total": completed, "completed": completed, "failed": 0, "in_progress": 0},
            "latest": {"completed": {"id": batch, "status": "COMPLETED"} if completed else None},
        }
