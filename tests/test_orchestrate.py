"""DAG orchestration: ordering, retries, failure propagation,
journal resume, backfill, and the ModelRunner bridge (reference:
airflow/dags/produce_event_dag.py + dbt dependency-ordered runs)."""

from __future__ import annotations

import pytest

from hr_moderndatapipeline_spark.plans.models import Model, ModelRunner
from hr_moderndatapipeline_spark.plans.orchestrate import (
    Dag,
    TaskSpec,
    dag_from_models,
)


def _ok(log, name):
    def _fn(ctx):
        log.append(name)
        return name

    return _fn


class TestDagRun:
    def test_topological_order_and_xcom(self):
        log = []
        dag = Dag(
            "d",
            [
                TaskSpec("c", lambda ctx: log.append("c") or ctx.results["a"] + ctx.results["b"], ("a", "b")),
                TaskSpec("b", lambda ctx: log.append("b") or 2, ("a",)),
                TaskSpec("a", lambda ctx: log.append("a") or 1),
            ],
        )
        res = dag.run("2026-08-13")
        assert log.index("a") < log.index("b") < log.index("c")
        assert all(r.state == "success" for r in res.values())

    def test_retry_then_succeed(self):
        calls = {"n": 0}
        slept = []

        def flaky(ctx):
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return "ok"

        dag = Dag(
            "d",
            [TaskSpec("t", flaky, retries=3, retry_delay_sec=1.0)],
            sleep=slept.append,
        )
        res = dag.run("2026-08-13")
        assert res["t"].state == "success" and res["t"].attempts == 3
        assert slept == [1.0, 2.0]  # linear backoff

    def test_failure_marks_transitive_downstream(self):
        def boom(ctx):
            raise RuntimeError("boom")

        log = []
        dag = Dag(
            "d",
            [
                TaskSpec("a", boom, retries=1),
                TaskSpec("b", _ok(log, "b"), ("a",)),
                TaskSpec("c", _ok(log, "c"), ("b",)),
                TaskSpec("island", _ok(log, "island")),
            ],
        )
        res = dag.run("2026-08-13")
        assert res["a"].state == "failed" and res["a"].attempts == 2
        assert "boom" in res["a"].error
        assert res["b"].state == "upstream_failed"
        assert res["c"].state == "upstream_failed"
        assert res["island"].state == "success"  # independent branch continues

    def test_validation(self):
        with pytest.raises(ValueError, match="unknown deps"):
            Dag("d", [TaskSpec("a", lambda c: None, ("ghost",))])
        with pytest.raises(ValueError, match="duplicate"):
            Dag("d", [TaskSpec("a", lambda c: None), TaskSpec("a", lambda c: None)])


class TestResumeAndBackfill:
    def test_journal_resume_skips_completed(self, tmp_path):
        state = str(tmp_path / "state.json")
        runs = []

        def once(ctx):
            runs.append(ctx.logical_date)
            return 1

        def boom(ctx):
            raise RuntimeError("fail this run")

        dag = Dag("d", [TaskSpec("a", once), TaskSpec("b", boom, ("a",))], state_path=state)
        r1 = dag.run("2026-08-01")
        assert r1["a"].state == "success" and r1["b"].state == "failed"
        # Re-run: a is journaled → skipped, b retried fresh.
        fixed = Dag("d", [TaskSpec("a", once), TaskSpec("b", lambda c: 2, ("a",))], state_path=state)
        r2 = fixed.run("2026-08-01")
        assert r2["a"].state == "skipped" and r2["b"].state == "success"
        assert runs == ["2026-08-01"]  # a executed exactly once
        # A different logical date runs everything again.
        r3 = fixed.run("2026-08-02")
        assert r3["a"].state == "success"

    def test_backfill_ordered_and_idempotent(self, tmp_path):
        state = str(tmp_path / "state.json")
        seen = []
        dag = Dag(
            "d",
            [TaskSpec("t", lambda ctx: seen.append(ctx.logical_date))],
            state_path=state,
        )
        out = dag.backfill(["2026-08-03", "2026-08-01", "2026-08-02"])
        assert seen == ["2026-08-01", "2026-08-02", "2026-08-03"]  # oldest first
        assert set(out) == {"2026-08-01", "2026-08-02", "2026-08-03"}
        # Second backfill over the same window is a no-op.
        out2 = dag.backfill(["2026-08-01", "2026-08-02", "2026-08-03"])
        assert seen == ["2026-08-01", "2026-08-02", "2026-08-03"]
        assert all(r["t"].state == "skipped" for r in out2.values())


class TestParallel:
    def test_independent_tasks_run_concurrently(self, tmp_path):
        """Two independent tasks meet at a barrier: only possible if
        they genuinely run at the same time (a serial executor would
        dead-wait and trip the barrier timeout). The downstream task
        still sees both upstream results."""
        import threading

        barrier = threading.Barrier(2, timeout=10)

        def side(v):
            def _fn(ctx):
                barrier.wait()  # raises BrokenBarrierError if serial
                return v

            return _fn

        dag = Dag(
            "p",
            [
                TaskSpec("a", side(1)),
                TaskSpec("b", side(2)),
                TaskSpec("join", lambda ctx: ctx.results["a"] + ctx.results["b"], ("a", "b")),
            ],
            state_path=str(tmp_path / "s.json"),
        )
        res = dag.run("2026-08-13", max_parallel=2)
        assert all(r.state == "success" for r in res.values())
        assert res["join"].value == 3
        # journal resume works identically through the parallel path
        res2 = dag.run("2026-08-13", max_parallel=2)
        assert all(r.state == "skipped" for r in res2.values())

    def test_parallel_failure_propagates(self):
        def boom(ctx):
            raise RuntimeError("boom")

        dag = Dag(
            "p",
            [
                TaskSpec("a", boom),
                TaskSpec("b", lambda ctx: 1),
                TaskSpec("c", lambda ctx: 1, ("a",)),
            ],
        )
        res = dag.run("2026-08-13", max_parallel=3)
        assert res["a"].state == "failed"
        assert res["b"].state == "success"
        assert res["c"].state == "upstream_failed"


class TestModelBridge:
    def test_models_run_orchestrated_with_resume(self, spark, tmp_path):
        spark.range(5).createOrReplaceTempView("src_numbers")
        models = [
            Model("doubled", "SELECT id, id * 2 AS v FROM base", ("base",)),
            Model("base", "SELECT id FROM src_numbers WHERE id > 0"),
        ]
        runner = ModelRunner(spark, models, table_root=str(tmp_path))
        dag = dag_from_models("gold", runner, state_path=str(tmp_path / "s.json"))
        res = dag.run("2026-08-13")
        assert all(r.state == "success" for r in res.values())
        assert spark.table("doubled").count() == 4
        # Resume: both models journaled → skipped.
        res2 = dag_from_models(
            "gold", runner, state_path=str(tmp_path / "s.json")
        ).run("2026-08-13")
        assert all(r.state == "skipped" for r in res2.values())

    def test_resume_rehydrates_views_and_xcom_after_restart(self, spark, tmp_path):
        """ADVICE r4: a journal-resumed run must restore what the
        completed tasks made observable — XCom values and model temp
        views — or downstream work added after the restart fails on
        state that 'should' exist."""
        spark.range(5).createOrReplaceTempView("src_numbers")
        models = [
            Model("base2", "SELECT id FROM src_numbers WHERE id > 0",
                  materialization="table"),
            Model("doubled2", "SELECT id, id * 2 AS v FROM base2", ("base2",)),
        ]
        runner = ModelRunner(spark, models, table_root=str(tmp_path))
        state = str(tmp_path / "s.json")
        res = dag_from_models("gold", runner, state_path=state).run("2026-08-14")
        assert all(r.state == "success" for r in res.values())

        # Simulate a process restart: the catalog loses the temp views.
        spark.catalog.dropTempView("base2")
        spark.catalog.dropTempView("doubled2")

        res2 = dag_from_models("gold", runner, state_path=state).run("2026-08-14")
        assert all(r.state == "skipped" for r in res2.values())
        # Views are back and readable; XCom carries the DataFrames.
        assert spark.table("doubled2").count() == 4
        assert res2["base2"].value is not None
        assert res2["base2"].value.count() == 4

    def test_rehydrate_failure_fails_downstream(self, tmp_path):
        state = str(tmp_path / "s.json")

        def _boom_rehydrate(ctx):
            raise RuntimeError("table is gone")

        a = TaskSpec("a", lambda c: 1, rehydrate=_boom_rehydrate)
        dag = Dag("d", [a], state_path=state)
        assert dag.run("2026-08-14")["a"].state == "success"
        # Restart adds downstream work that reads a's XCom: a's
        # rehydration failure must block it, not hand it a KeyError.
        tasks = [a, TaskSpec("b", lambda c: c.results["a"] + 1, ("a",))]
        res2 = Dag("d", tasks, state_path=state).run("2026-08-14")
        assert res2["a"].state == "failed"
        assert "rehydrate" in res2["a"].error
        assert res2["b"].state == "upstream_failed"
