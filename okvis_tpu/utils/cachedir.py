"""Machine-scoped persistent-compilation-cache directories.

JAX's persistent cache keys executables by HLO + compile options but NOT by
the host CPU's feature set; XLA:CPU AOT executables compiled on one machine
can SIGILL/segfault on another (cpu_aot_loader warns exactly this). Rounds
of this workspace run on heterogeneous hosts, so every cache path is
suffixed with a fingerprint of the CPU flags — a foreign-machine cache is
simply never loaded.
"""

from __future__ import annotations

import hashlib
import os


def machine_tag() -> str:
    """Short stable fingerprint of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def cache_dir(base: str) -> str:
    """`base` extended with the machine fingerprint (created if missing)."""
    path = os.path.join(base, machine_tag())
    os.makedirs(path, exist_ok=True)
    return path


def configure(jax, base: str) -> None:
    """Point jax's persistent compilation cache at the machine-scoped dir."""
    jax.config.update("jax_compilation_cache_dir", cache_dir(base))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
