"""Multi-table routing — the vchannel-dispatch analog (S2).

The reference splits one pchannel stream into per-collection vchannel
packs (``core/msgdispatcher/dispatcher.go:262-368`` groupAndParseMsgs)
and runs one write pipeline per target. Here: one event log fans out to
N icebox tables, each selected by a repo-scope predicate — a pure
Catalyst filter per table (the predicate pushes into the shared scan),
no custom dispatch code.

Routes must be disjoint for exactly-once bookkeeping to stay per-route.
The eager construction-time check is BEST-EFFORT: it rejects every pair
it can PROVE overlaps, and only anchored-exact scopes (``^name$``) are
fully decidable. For unanchored literal substrings, containment proves
overlap, but non-containment does not prove disjointness ("foo" and
"bar" both match repo "foo-bar") — anchor your scopes if you want the
guarantee; free-form regex scopes remain the operator's responsibility,
same as the reference's duplicate-collection guard
(``server/cdc_impl.go:328-406``).

Each route is a full ReplicateJob with its own checkpoint stream, so a
lagging table never blocks the others — the main/solo dispatcher
isolation property (``core/msgdispatcher/manager.go:57-150``) for free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from milvus_cdc_spark.plans.apply import ReplicateJob
from milvus_cdc_spark.plans.metastore import Metastore


@dataclass
class Route:
    name: str
    table_root: str
    repo_pattern: str  # rlike scope; DDL (null-repo) rows reach every route


class MultiTableRouter:
    def __init__(
        self,
        spark: SparkSession,
        source,
        metastore: Metastore,
        routes: list[Route],
        **job_kwargs,
    ):
        names = [r.name for r in routes]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate route names: {names}")
        roots = [r.table_root for r in routes]
        if len(set(roots)) != len(roots):
            raise ValueError("two routes target one table")
        self._check_literal_scope_overlap(routes)
        self.jobs = {
            r.name: ReplicateJob(
                spark=spark,
                source=source,
                table_root=r.table_root,
                metastore=metastore,
                task_id=f"route-{r.name}",
                repo_pattern=r.repo_pattern,
                **job_kwargs,
            )
            for r in routes
        }

    @staticmethod
    def _check_literal_scope_overlap(routes: list[Route]) -> None:
        """Best-effort eager overlap check. Rejects every pair it can
        PROVE overlaps; it does NOT prove the survivors disjoint.

        Decidable classes (``rlike`` is an unanchored substring match):

        - anchored-exact ``^name$`` vs anchored-exact: overlap iff the
          names are equal — fully decidable, the scope style to use when
          disjointness must be guaranteed;
        - anchored-exact vs literal substring: overlap iff the substring
          occurs in the exact name — also fully decidable;
        - substring vs substring: CONTAINMENT proves overlap (every repo
          matching the longer matches the shorter), but non-containment
          proves nothing — "foo" and "bar" both match repo "foo-bar".
          Such pairs pass the check and remain the operator's
          responsibility (or anchor them).

        Patterns with other regex metacharacters are not analyzed."""
        meta = set("\\^$+?{}[]|().*")

        def classify(p: str) -> tuple[str, str] | None:
            if p == "*":
                return ("sub", "")
            if p.startswith("^") and p.endswith("$"):
                body = p[1:-1]
                return ("exact", body) if not any(ch in meta for ch in body) else None
            body = p[:-2] if p.endswith(".*") else p
            return ("sub", body) if not any(ch in meta for ch in body) else None

        lits = [(r, classify(r.repo_pattern)) for r in routes]
        lits = [(r, c) for r, c in lits if c is not None]
        for i, (ra, (ka, a)) in enumerate(lits):
            for rb, (kb, b) in lits[i + 1:]:
                if ka == "exact" and kb == "exact":
                    clash = a == b
                elif ka == "exact":
                    clash = b in a  # substring b matches exact name a?
                elif kb == "exact":
                    clash = a in b
                else:
                    clash = a in b or b in a
                if clash:
                    raise ValueError(
                        f"routes {ra.name!r} and {rb.name!r} have overlapping "
                        f"scopes ({ra.repo_pattern!r}, {rb.repo_pattern!r}): "
                        "events would double-apply to both tables"
                    )

    def run(
        self,
        until_seq: int,
        max_batches: int | None = None,
        concurrent: bool = False,
        max_workers: int | None = None,
    ) -> dict[str, dict]:
        """Advance every route.

        ``concurrent=True`` runs one driver thread per route so the N
        routes' Spark jobs interleave in the session's scheduler instead
        of serializing — the reference runs one replicate pipeline per
        channel concurrently (``core/reader/replicate_channel_manager.go:
        76-81``). Safe because routes are fully independent: each has its
        own icebox table (enforced at construction), its own checkpoint
        key, and Spark job submission is thread-safe. Errors are isolated
        per route: a failing route reports ``{"error": ...}`` in its slot
        (its checkpoint simply stops advancing — the pause analog) while
        every other route runs to completion.
        """
        if not concurrent:
            return {
                name: job.run(until_seq, max_batches=max_batches)
                for name, job in self.jobs.items()
            }
        from concurrent.futures import ThreadPoolExecutor

        results: dict[str, dict] = {}
        with ThreadPoolExecutor(
            max_workers=max_workers or len(self.jobs), thread_name_prefix="route"
        ) as ex:
            futures = {
                name: ex.submit(job.run, until_seq, max_batches=max_batches)
                for name, job in self.jobs.items()
            }
            for name, fut in futures.items():
                try:
                    results[name] = fut.result()
                except Exception as e:  # noqa: BLE001 — isolate, don't mask
                    results[name] = {"error": f"{type(e).__name__}: {e}"}
        return results

    def positions(self) -> dict[str, dict]:
        return {
            name: job.metastore.load_checkpoint(job.task_id)
            for name, job in self.jobs.items()
        }
