"""Hyperparameter-optimization reporting glue.

Equivalent of the reference ``utils/hpopt.py`` (463 LoC of Orion/generic
HPO glue): a reporter abstraction that experiments use to emit their
objective value to whatever HPO orchestrator launched them, selected by
``--hpopt`` mode:

- ``generic``: print a JSON line the orchestrator parses;
- ``orion``: report through the orion client when importable (gated);
- disabled: all calls are no-ops.

Usage (recipe side)::

    with hyperparameter_optimization(objective_key="WER") as hp_ctx:
        hparams_file, run_opts, overrides = parse_arguments(...)
        ...
        hp_ctx.report_result(stats)   # e.g. at each VALID stage end

The reported result is the *last* one (typically the best-checkpoint
metric), matching the reference semantics.
"""

import json
import logging
import os

logger = logging.getLogger(__name__)

_context = {"current": None}

HPOPT_MODE_ENV = "HPOPT_MODE"
HPOPT_KEY_ENV = "HPOPT_OBJECTIVE_KEY"


class HyperparameterOptimizationContext:
    def __init__(self, objective_key="objective", mode=None):
        self.objective_key = objective_key
        self.mode = mode or os.environ.get(HPOPT_MODE_ENV)
        self.result = None

    @property
    def enabled(self):
        return self.mode is not None

    def report_result(self, result):
        """Record a result dict; the last reported value wins."""
        if not self.enabled or not result:
            return
        if self.objective_key in result:
            self.result = dict(result)

    def finalize(self):
        if not self.enabled or self.result is None:
            return
        objective = self.result[self.objective_key]
        if self.mode == "orion":
            try:
                import orion.client
                orion.client.report_objective(objective)
                return
            except ImportError:
                logger.warning("orion not importable; falling back to "
                               "generic hpopt output")
        print(json.dumps({"hpopt_result": self.result,
                          "objective": objective}))

    def __enter__(self):
        _context["current"] = self
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.finalize()
        _context["current"] = None
        return False


def hyperparameter_optimization(objective_key="objective", mode=None):
    """Context manager entry point (reference ``hpopt.py`` API)."""
    return HyperparameterOptimizationContext(objective_key, mode)


def report_result(result):
    """Module-level report to the active context (if any)."""
    ctx = _context["current"]
    if ctx is not None:
        ctx.report_result(result)


def get_current_context():
    return _context["current"]
