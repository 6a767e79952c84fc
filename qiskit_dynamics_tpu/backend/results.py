"""Native result containers (duck-typing qiskit's ``Result`` interface).

The reference returns ``qiskit.result.Result`` objects
(``/root/reference/qiskit_dynamics/backend/dynamics_backend.py:458-520``);
these native equivalents expose the same consumer surface: ``get_counts``,
``get_memory``, ``success``, and per-experiment ``data``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from ..exceptions import DynamicsError

__all__ = ["Header", "ExperimentResultData", "ExperimentResult", "Result"]


class Header(dict):
    """Dict with attribute access — parity with qiskit's
    ``QobjExperimentHeader`` so consumer code written against the reference
    (``result.results[0].header.metadata``) works unchanged."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc


@dataclass
class ExperimentResultData:
    """Counts / memory payload of one experiment."""

    counts: Optional[Dict[str, int]] = None
    memory: Optional[Any] = None


@dataclass
class ExperimentResult:
    """Result of one simulated experiment."""

    shots: int
    success: bool
    data: ExperimentResultData
    meas_level: int = 2
    seed: Optional[int] = None
    header: Dict[str, Any] = field(default_factory=Header)

    def __post_init__(self):
        if not isinstance(self.header, Header):
            self.header = Header(self.header or {})

    @property
    def name(self) -> Optional[str]:
        """Experiment name from the header."""
        return self.header.get("name")


@dataclass
class Result:
    """Collection of experiment results."""

    backend_name: str
    backend_version: str
    job_id: str
    success: bool
    results: List[ExperimentResult]
    date: Optional[str] = None

    def _resolve(self, experiment: Union[None, int, str]) -> ExperimentResult:
        if experiment is None:
            if len(self.results) == 1:
                return self.results[0]
            raise DynamicsError(
                "Result contains multiple experiments; specify an index or name."
            )
        if isinstance(experiment, int):
            return self.results[experiment]
        for res in self.results:
            if res.name == experiment:
                return res
        raise DynamicsError(f'Experiment "{experiment}" not found in result.')

    def get_counts(
        self, experiment: Union[None, int, str] = None
    ) -> Union[Dict[str, int], List[Dict[str, int]]]:
        """Counts of an experiment.

        With no ``experiment`` and multiple experiments present, returns the
        list of counts dicts (qiskit ``Result.get_counts`` behavior)."""
        if experiment is None and len(self.results) > 1:
            return [self.get_counts(i) for i in range(len(self.results))]
        counts = self._resolve(experiment).data.counts
        if counts is None:
            raise DynamicsError("No counts available in this experiment result.")
        return counts

    def get_memory(self, experiment: Union[None, int, str] = None):
        """Per-shot memory (outcome list or IQ array) of an experiment."""
        memory = self._resolve(experiment).data.memory
        if memory is None:
            raise DynamicsError("No memory available in this experiment result.")
        return memory
