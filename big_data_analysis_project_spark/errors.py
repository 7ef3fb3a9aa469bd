"""Engine-wide exception types. Kept dependency-free so operator and
registry modules can both import them without touching package
``__init__`` side effects (the registry package imports the operator
package, so an operator importing ``registry._base`` directly would be
circular)."""

from __future__ import annotations


class ScaleRefusal(ValueError):
    """Raised by a probe-and-refuse guard: the key measured its own
    pre-flight cost (pairs_bound / wedges / row count), found it over
    the declared budget, and refused INSTEAD of silently paying a
    scale-killing bill (VERDICT r8 #5). Subclasses ValueError so
    existing callers and tests keep working; carrying its own type
    lets harnesses (bench.py's ``refusals`` bucket) record a designed
    refusal separately from a genuine failure — a reader of the
    artifact should never mistake the guard doing its job for a
    regression. Every refusal message names the measured bill, the
    budget, the capped/flat alternative tier, and the deliberate
    override.

    Machine-readable fields (VERDICT r9 #8): a 100 TB pipeline that
    catches this should be able to ROUTE to the bounded tier
    programmatically instead of parsing prose, so the guard also
    passes its numbers as structured keywords. ``payload()`` returns
    the non-None fields as a plain dict for artifact recording
    (bench.py's refusals bucket). The human message is unchanged —
    the fields are additive.

    * ``key``: the guard site (artifact or registry-key name);
    * ``measured``: the measured pre-flight bound (pairs/wedges);
    * ``budget``: the budget it exceeded;
    * ``alternative``: the registry key of the bounded/flat tier a
      caller should route to;
    * ``override_env``: the env var a deliberate run sets to pay the
      bill anyway;
    * ``extra``: guard-specific structured fields the five shared
      slots don't model (round 11 — the kNN QUALITY refusal needs
      ``target_recall`` / ``probes_tried`` / ``n_cells``, which are
      not a pairs bill). Merged flat into ``payload()`` so artifact
      readers see one dict; a NON-None shared slot wins on name
      collision, while a None shared slot leaves a same-named extra
      entry intact (ADVICE r11 — an unconditional overwrite would
      silently drop the extra through the None filter).
    """

    def __init__(
        self,
        message: str,
        *,
        key: str | None = None,
        measured: int | float | None = None,
        budget: int | float | None = None,
        alternative: str | None = None,
        override_env: str | None = None,
        extra: dict | None = None,
    ) -> None:
        super().__init__(message)
        self.key = key
        self.measured = measured
        self.budget = budget
        self.alternative = alternative
        self.override_env = override_env
        self.extra = dict(extra) if extra else {}

    def payload(self) -> dict:
        """The structured fields (non-None only), artifact-ready."""
        fields = dict(self.extra)
        shared = {
            "key": self.key,
            "measured": self.measured,
            "budget": self.budget,
            "alternative": self.alternative,
            "override_env": self.override_env,
        }
        # shared slots win on collision ONLY when actually set (ADVICE
        # r11): an unconditional update would map a None shared slot
        # over a same-named extra entry and the None-filter below would
        # then drop the key entirely — silent data loss, not precedence
        fields.update({k: v for k, v in shared.items() if v is not None})
        return {k: v for k, v in fields.items() if v is not None}


class NoBoundedTier(ScaleRefusal):
    """Raised by ``router.run_routed`` when every tier on a key's
    declared fallback chain refused (or the chain is empty): the
    requested question has NO bounded tier the engine is willing to
    claim as the same question at this scale — e.g.
    ``dedup_containment``, whose asymmetric metric minhash banding
    does not approximate, so silently substituting an LSH surface
    would be a wrong answer, not a cheaper one.

    Subclasses :class:`ScaleRefusal` ON PURPOSE: a harness (bench.py's
    refusals bucket) records a dead-ended route as a designed refusal,
    never a regression, and the structured fields of the LAST refusal
    on the chain ride along for the caller that wants to price the
    override. ``hops`` carries the full chain — each entry is
    ``{"key": ..., "outcome": "refused", "refusal": payload}`` — so an
    artifact reader sees every tier that was tried and why it said no.
    """

    def __init__(self, message: str, *, hops=(), **kw) -> None:
        super().__init__(message, **kw)
        self.hops = tuple(hops)

    def payload(self) -> dict:
        fields = super().payload()
        if self.hops:
            fields["hops"] = [dict(h) for h in self.hops]
        return fields
