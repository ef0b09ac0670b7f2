"""Health checks (reference ``observability/HealthCheck.h:19-102``)."""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable, Dict, List


class HealthStatus(enum.Enum):
    HEALTHY = "healthy"
    DEGRADED = "degraded"
    UNHEALTHY = "unhealthy"


@dataclass
class HealthCheckResult:
    name: str
    status: HealthStatus
    message: str = ""
    critical: bool = True


@dataclass
class HealthCheck:
    name: str
    check: Callable[[], HealthCheckResult]
    critical: bool = True


class HealthRegistry:
    def __init__(self):
        self._checks: Dict[str, HealthCheck] = {}

    def register(self, name: str, check: Callable[[], HealthCheckResult],
                 critical: bool = True) -> None:
        self._checks[name] = HealthCheck(name, check, critical)

    def run_all(self) -> List[HealthCheckResult]:
        results = []
        for hc in self._checks.values():
            try:
                r = hc.check()
            except Exception as e:  # noqa: BLE001 - report, don't crash
                r = HealthCheckResult(
                    hc.name, HealthStatus.UNHEALTHY, str(e), hc.critical
                )
            r.critical = hc.critical
            results.append(r)
        return results

    def overall(self) -> HealthStatus:
        """UNHEALTHY if any critical check fails; DEGRADED if any
        non-critical fails (reference critical/non-critical semantics)."""
        status = HealthStatus.HEALTHY
        for r in self.run_all():
            if r.status != HealthStatus.HEALTHY:
                if r.critical:
                    return HealthStatus.UNHEALTHY
                status = HealthStatus.DEGRADED
        return status


def device_health_check() -> HealthCheckResult:
    """Liveness of the JAX backend (the framework's critical dependency)."""
    try:
        import jax

        n = len(jax.devices())
        return HealthCheckResult(
            "jax_devices",
            HealthStatus.HEALTHY if n > 0 else HealthStatus.UNHEALTHY,
            f"{n} device(s), backend={jax.default_backend()}",
        )
    except Exception as e:  # pragma: no cover
        return HealthCheckResult("jax_devices", HealthStatus.UNHEALTHY, str(e))
