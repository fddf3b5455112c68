"""Local runner for Spark 4.1 Declarative Pipelines (SDP).

``pyspark.pipelines`` ships the declarative API (`@sdp.materialized_view`,
`@sdp.table`, `@sdp.flow`) but its only bundled execution backend is
Spark Connect (`spark_connect_graph_element_registry`), which this
environment does not run. The API is deliberately backend-agnostic: a
`GraphElementRegistry` receives the declared outputs and flows, and
anything can execute them.

This module supplies that backend for the engine's job layer:

* :class:`LocalGraphElementRegistry` — collects outputs + flows
  declared while it is the active registry (the same thread-local
  context the Connect backend uses).
* :func:`run_pipeline` — executes the collected flows in dependency
  order by fixed-point iteration: a flow whose inputs aren't
  registered yet (`spark.table(...)` raises) is retried after the
  others; a full round with no progress means a genuinely missing or
  cyclic dependency and raises with the failing flows' errors.

Each materialized view becomes a session temp view, so downstream
flows read upstream results with plain ``spark.table(name)`` — the
exact dependency mechanism SDP prescribes. At cluster scale the same
runner pattern materializes to parquet/catalog tables instead of temp
views (swap `_materialize`); the declaration surface is unchanged.

The reference's linear job (`gule_test_job.py:54-211` — extract,
merge, audit, load) maps 1:1 onto this: each stage an
`@sdp.materialized_view`, the DAG explicit, re-runnable, and testable
stage-by-stage (see ``tests/test_sdp_local.py``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

try:  # Spark 4.1+
    from pyspark.pipelines.flow import Flow
    from pyspark.pipelines.graph_element_registry import (
        GraphElementRegistry,
        graph_element_registration_context,
    )
    from pyspark.pipelines.output import Output

    HAS_SDP = True
except ImportError:  # pragma: no cover - older Spark
    HAS_SDP = False
    GraphElementRegistry = object  # type: ignore[assignment,misc]


class LocalGraphElementRegistry(GraphElementRegistry):
    """Collects the outputs and flows a pipeline module declares."""

    def __init__(self) -> None:
        self.outputs: list = []
        self.flows: list = []

    def register_output(self, output: "Output") -> None:
        self.outputs.append(output)

    def register_flow(self, flow: "Flow") -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path) -> None:
        raise NotImplementedError(
            "SQL-file graph elements need the Connect backend's SQL "
            "splitter; declare Python flows instead"
        )


def run_pipeline(
    spark: SparkSession,
    declare: Callable[[], None],
    max_rounds: int = 25,
) -> dict[str, DataFrame]:
    """Register and execute a declarative pipeline locally.

    ``declare`` is a zero-arg callable whose body declares SDP
    elements (`@sdp.materialized_view` etc. run at definition time, so
    the declarations must happen INSIDE ``declare`` while this
    registry is active).

    Returns {flow_target: DataFrame} for every materialized flow; each
    is also registered as a temp view under its target name.
    """
    if not HAS_SDP:  # pragma: no cover - older Spark
        raise NotImplementedError("pyspark.pipelines requires Spark 4.1+")
    registry = LocalGraphElementRegistry()
    with graph_element_registration_context(registry):
        declare()

    # Drop any pre-existing temp views with this pipeline's target
    # names: without this, a flow whose declared upstream hasn't run
    # yet could silently bind to a STALE view left by an earlier
    # run_pipeline in the same session and return outdated data
    # instead of waiting its turn. Names this pipeline does NOT
    # declare are, by definition, external sources and resolve
    # against the session catalog as usual.
    for fl in registry.flows:
        spark.catalog.dropTempView(fl.target)

    declared_targets = {fl.target for fl in registry.flows}

    def _is_unresolved_upstream(e: Exception) -> bool:
        # Retry ONLY resolution failures for a view THIS pipeline
        # declares (its upstream hasn't run yet this round). Any other
        # exception is a genuine flow bug: re-running it each round
        # would repeat side effects and bury the real error, so fail
        # fast instead.
        from pyspark.errors import AnalysisException

        if not isinstance(e, AnalysisException):
            return False
        msg = str(e)
        if "TABLE_OR_VIEW_NOT_FOUND" not in msg:
            return False
        # Match the QUOTED identifier, not a raw substring: the error
        # message renders the missing relation as `name`, and a raw
        # substring test would misclassify a genuinely missing external
        # table whose name merely CONTAINS a declared target (target
        # 'docs', missing 'docs_raw') as retryable — silently spinning
        # for max_rounds instead of failing fast.
        return any(f"`{t}`" in msg for t in declared_targets)

    pending = list(registry.flows)
    done: dict[str, DataFrame] = {}
    for _ in range(max_rounds):
        if not pending:
            break
        progressed = False
        errors: dict[str, str] = {}
        still = []
        for fl in pending:
            try:
                df = fl.func()
            except Exception as e:
                if not _is_unresolved_upstream(e):
                    raise RuntimeError(
                        f"flow {fl.name!r} failed with a non-retryable "
                        f"error: {type(e).__name__}: {e}"
                    ) from e
                errors[fl.name] = f"{type(e).__name__}: {e}"
                still.append(fl)
                continue
            df.createOrReplaceTempView(fl.target)
            done[fl.target] = df
            progressed = True
        if not progressed:
            raise RuntimeError(
                f"pipeline stalled; unresolvable flows: {errors}"
            )
        pending = still
    if pending:  # pragma: no cover - needs a >25-deep chain
        raise RuntimeError(f"pipeline exceeded {max_rounds} rounds")
    return done
