"""Logging infrastructure: experiment logging setup + environment snapshot.

Equivalent of the reference ``utils/logger.py`` (:83-196): configure the
Python logging tree for an experiment (file + console), pretty
order-of-magnitude formatting, and an ``env.log`` environment description
(package versions, JAX devices, git state) for run forensics.
"""

import logging
import math
import os
import subprocess
import sys

ORDERS_ABBREV = {
    -24: "y", -21: "z", -18: "a", -15: "f", -12: "p", -9: "n", -6: "µ",
    -3: "m", 0: "", 3: "k", 6: "M", 9: "G", 12: "T", 15: "P", 18: "E",
    21: "Z", 24: "Y",
}


def setup_logging(log_file=None, console_level=logging.INFO,
                  file_level=logging.DEBUG):
    """Root-logger setup: console + optional debug file."""
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    # Raising the root level to DEBUG makes third-party loggers with
    # their own NOTSET handlers (jax attaches a stderr StreamHandler)
    # emit every per-dispatch DEBUG record — tens of MB per run and a
    # measurable per-step host cost on small hosts. Keep DEBUG for our
    # own tree, clamp the known-noisy libraries to INFO (the reference
    # achieves the same selectivity via log-config.yaml limiting
    # handlers to speechbrain loggers).
    for noisy in ("jax", "jaxlib", "absl", "numba", "matplotlib"):
        logging.getLogger(noisy).setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - "
                            "%(message)s")
    console = logging.StreamHandler()
    console.setLevel(console_level)
    console.setFormatter(fmt)
    root.addHandler(console)
    if log_file is not None:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setLevel(file_level)
        fh.setFormatter(fmt)
        root.addHandler(fh)


def format_order_of_magnitude(number, abbreviate=True):
    """1.2M-style formatting of large/small numbers."""
    if number == 0:
        return "0"
    order = 3 * math.floor(math.log10(abs(number)) / 3)
    order = max(min(order, 24), -24)
    scaled = number / (10 ** order)
    suffix = ORDERS_ABBREV[order] if abbreviate else f"e{order}"
    if scaled == int(scaled):
        return f"{int(scaled)}{suffix}"
    return f"{scaled:.1f}{suffix}"


def get_environment_description():
    """Text snapshot of the software environment (env.log contents)."""
    lines = ["Environment description", "=" * 40]
    lines.append(f"python: {sys.version.split()[0]}")
    for pkg in ("jax", "jaxlib", "flax", "optax", "numpy"):
        try:
            mod = __import__(pkg)
            lines.append(f"{pkg}: {getattr(mod, '__version__', '?')}")
        except ImportError:
            lines.append(f"{pkg}: not installed")
    try:
        import jax
        lines.append(f"devices: {[str(d) for d in jax.devices()]}")
    except Exception as e:  # noqa: BLE001 — forensics must not crash
        lines.append(f"devices: unavailable ({e})")
    try:
        git = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5, check=False)
        if git.returncode == 0:
            lines.append(f"git: {git.stdout.strip()}")
    except OSError:
        pass
    return "\n".join(lines) + "\n"
