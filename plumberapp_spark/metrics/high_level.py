"""High-level joined graph+metrics view (HighLevelPlumberModel analog,
pa/high_level_analysis.py:11-37): the plan DAG as a networkx DiGraph with
every node carrying its full profiled-stats summary dict as node
attributes, plus the topologically-remapped view and a graphviz dump with
stats annotations — the interactive-analysis surface the reference builds
by joining ``graphdef_to_networkx`` with
``ranked_list_bottleneck_nodes_analysis`` summaries.

Everything here is plan-sized (one node per operator, never per row), so
it is driver-side by contract — identical at 1000 executors.
"""

from __future__ import annotations

from dataclasses import asdict

from plumberapp_spark.metrics.model import MetricsModel
from plumberapp_spark.plans.nodes import Pipeline


class HighLevelModel:
    """Joined plan-DAG + per-node metrics view.

    ``networkx()`` returns the DAG with each node's stats dict attached
    as attributes (pa/high_level_analysis.py:20-27 — there via
    ``nx.set_node_attributes``); ``topologically_mapped_networkx()``
    relabels nodes by topological position
    (pa/high_level_analysis.py:31-37 ``remap_dataset_names``);
    ``to_graphviz()`` renders dot with rate/p_busy annotations.
    """

    def __init__(self, pipeline: Pipeline, model: MetricsModel):
        import networkx as nx

        self.pipeline = pipeline
        self.model = model
        G = nx.DiGraph()
        attrs = {s.name: asdict(s) for s in model.stats}
        for n in pipeline.nodes():
            a = dict(attrs.get(n.name, {}))
            a.setdefault("op", n.op)  # stats dicts already carry op
            G.add_node(n.name, **a)
        for child, parent in pipeline.edges():
            G.add_edge(child, parent)
        self._G = G

    def networkx(self):
        return self._G

    def topologically_mapped_networkx(self):
        """Nodes relabeled ``<topo_idx>_<op>`` in topological order —
        stable names for cross-run graph diffs (the reference's
        ``remap_dataset_names`` purpose)."""
        import networkx as nx

        order = list(nx.topological_sort(self._G))
        remap = {name: f"{i}_{self._G.nodes[name].get('op', 'op')}" for i, name in enumerate(order)}
        return nx.relabel_nodes(self._G, remap)

    def ranked_summaries(self) -> list[dict]:
        """Per-node summary dicts ascending by expected parallel max rate
        (head = bottleneck) — the ranked-node-analysis join input."""
        return sorted(
            (asdict(s) for s in self.model.stats),
            key=lambda d: (d["expected_parallel_max_rate"], d["name"]),
        )

    def to_graphviz(self) -> str:
        """Dot text with per-node stats annotations (rate, p_busy, core
        share) — the stats-joined variant of sinks.plan_to_dot."""
        lines = ["digraph pipeline {", "  rankdir=TB;"]
        bottleneck = self.model.bottleneck_node().name if self.model.stats else None
        for n in self.pipeline.nodes():
            a = self._G.nodes.get(n.name, {})
            label = n.label()
            if "observed_rate" in a:
                label += f"\\n{a['observed_rate']:.1f} el/s"
                label += f"\\np_busy={a.get('p_busy', 0.0):.3f}"
                label += f"\\ncores={a.get('num_cores_used', 0.0):.2f}"
            shape = "box" if n.op.startswith("source") else "ellipse"
            fill = ""
            if n.name == bottleneck:
                fill = ' style=filled fillcolor="salmon"'
            elif getattr(n, "cached", False):
                fill = ' style=filled fillcolor="lightblue"'
            lines.append(f'  "{n.name}" [label="{label}" shape={shape}{fill}];')
        for child, parent in self.pipeline.edges():
            lines.append(f'  "{child}" -> "{parent}";')
        lines.append("}")
        return "\n".join(lines)
