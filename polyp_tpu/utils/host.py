"""Host identity helpers for persistent-compile-cache keying."""

from __future__ import annotations


def host_fingerprint() -> str:
    """Short stable hash of this host's CPU features + jax version.

    Used to partition persistent compile caches per host class
    (tests/conftest.py): a CPU AOT executable compiled with one machine's
    ISA extensions (AVX-512 etc.) must never be deserialized on a host
    that lacks them — the cpu_aot_loader warns but does not always refuse,
    leaving a latent SIGILL (VERDICT r3 #6). Note the dual limitation:
    same-host reloads still log a feature-mismatch error because XLA bakes
    tuning pseudo-features (+prefer-no-scatter/-gather) into every
    artifact, which is why the multichip dryrun opts out of persistent
    caching entirely (__graft_entry__.dryrun_multichip)."""
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
