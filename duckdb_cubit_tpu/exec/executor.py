"""Query executor: pipeline construction + driving.

Analog of the reference Executor (reference src/parallel/executor.cpp:351
InitializeInternal breaking the plan into MetaPipelines; :70 SchedulePipeline
building the event DAG).  The TPU engine's pipelines are coarser — a pipeline
is a maximal chain of mask-preserving operators ending in a breaker (join
build, aggregate, sort) — and the "event DAG" is the topological order of
breaker dependencies.  Execution of one pipeline is one (or a few) XLA
programs; parallelism within a pipeline comes from XLA/the mesh rather than
a thread pool.
"""

from __future__ import annotations

import dataclasses

from ..plan import optimizer as opt
from ..plan.physical import ExecContext, PhysicalOperator, Relation
from .profiler import QueryProfiler


@dataclasses.dataclass
class Pipeline:
    """source -> operators -> sink chain (reference src/parallel/pipeline.hpp)."""
    operators: list
    dependencies: list

    def describe(self):
        return " -> ".join(op.describe() for op in self.operators)


def build_pipelines(root: PhysicalOperator) -> list[Pipeline]:
    """Break the operator tree at pipeline breakers (MetaPipeline analog).

    Build sides / blocking children become child pipelines that must complete
    before the parent pipeline runs (meta_pipeline.cpp:85-97 semantics).
    """
    pipelines: list[Pipeline] = []

    def walk(op) -> Pipeline:
        deps = []
        chain = []

        def descend(o):
            for blocked in o.blocking_children():
                deps.append(walk(blocked))
            streaming_children = [c for c in o.children
                                  if c not in o.blocking_children()]
            for c in streaming_children:
                if c.is_pipeline_breaker():
                    deps.append(walk(c))
                else:
                    descend(c)
            chain.append(o)

        descend(op)
        p = Pipeline(chain, deps)
        pipelines.append(p)
        return p

    walk(root)
    return pipelines


class Executor:
    def __init__(self, catalog, config=None):
        self.catalog = catalog
        self.config = config

    def execute(self, plan: PhysicalOperator, profile: bool = False,
                optimize: bool = True):
        profiler = QueryProfiler() if profile else None
        if optimize:
            if profiler:
                with profiler.phase("optimizer"):
                    plan = opt.optimize(plan, self.catalog)
            else:
                plan = opt.optimize(plan, self.catalog)
        ctx = ExecContext(self.catalog, self.config, profiler)
        # pipelines are executed implicitly in dependency order by the
        # operator recursion; building them drives profiling structure and
        # (later) async scheduling
        self.pipelines = build_pipelines(plan)
        if profiler:
            with profiler.phase("execute"):
                rel = plan.execute(ctx)
            self.profiler = profiler
        else:
            rel = plan.execute(ctx)
            self.profiler = None
        self.plan = plan
        return rel
