"""Warm-start parameter transfer (distinct from resume).

Equivalent of the reference ``Pretrainer``
(``vendor/speechbrain/speechbrain/utils/parameter_transfer.py:25-344``):
collect parameter files (local paths, or HF hub when available) into the
experiment's save folder, then load them into live objects. Loadables are
conditional (the recipe only transfers when ``model_path`` is set).

For JAX, a "parameter file" is a msgpack-serialized pytree (the same
format the Checkpointer writes per recoverable), loaded with
``flax.serialization.from_state_dict`` so partially-matching trees
transfer what they can.
"""

import logging
import os
import shutil

logger = logging.getLogger(__name__)


class Pretrainer:
    def __init__(self, collect_in="./model_checkpoints", loadables=None,
                 paths=None, conditions=None):
        self.collect_in = collect_in
        self.loadables = loadables or {}
        self.paths = paths or {}
        self.conditions = conditions or {}
        self.collected = {}

    def add_loadable(self, name, obj, path=None, condition=True):
        self.loadables[name] = obj
        if path is not None:
            self.paths[name] = path
        self.conditions[name] = condition

    def _enabled(self, name):
        cond = self.conditions.get(name, True)
        return bool(cond)

    def collect_files(self):
        """Fetch/link each enabled loadable's file into collect_in."""
        os.makedirs(self.collect_in, exist_ok=True)
        for name, source in self.paths.items():
            if not self._enabled(name) or source is None:
                continue
            target = os.path.join(self.collect_in, f"{name}.ckpt")
            if os.path.isdir(source):
                candidate = os.path.join(source, f"{name}.ckpt")
                if os.path.isfile(candidate):
                    source = candidate
                else:
                    raise FileNotFoundError(
                        f"No {name}.ckpt inside directory {source}")
            if not os.path.isfile(source):
                raise FileNotFoundError(
                    f"Pretrained source not found: {source} (in offline "
                    f"environments HF hub fetching is unavailable)")
            if os.path.abspath(source) != os.path.abspath(target):
                try:
                    if os.path.lexists(target):
                        os.remove(target)
                    os.symlink(os.path.abspath(source), target)
                except OSError:
                    shutil.copy(source, target)
            self.collected[name] = target
        return self.collected

    def load_collected(self):
        """Load collected files into the registered loadables (objects
        with a ``load(path)`` method or pytree setters)."""
        for name, target in self.collected.items():
            obj = self.loadables.get(name)
            if obj is None:
                continue
            if hasattr(obj, "load"):
                obj.load(target, end_of_epoch=True)
            else:
                raise TypeError(f"Loadable {name} has no load() hook")
            logger.info("Warm-started %s from %s", name, target)

    def load_pytree_into(self, name, template):
        """Load a collected msgpack pytree onto a template pytree."""
        from flax import serialization
        with open(self.collected[name], "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        if isinstance(restored, dict) and "params" in restored:
            restored = restored["params"]
        return serialization.from_state_dict(template, restored)
