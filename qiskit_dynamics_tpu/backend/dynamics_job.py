"""Synchronous simulation job.

Reference behavior: ``/root/reference/qiskit_dynamics/backend/dynamics_job.py``
(a JobV1 whose ``submit`` runs the function immediately).
"""
from __future__ import annotations

import time
from typing import Callable, Optional

from ..exceptions import DynamicsError

__all__ = ["DynamicsJob", "JobStatus"]


class JobStatus:
    """Job status constants."""

    INITIALIZING = "INITIALIZING"
    DONE = "DONE"


class DynamicsJob:
    """Job that runs synchronously on ``submit``."""

    def __init__(self, backend, job_id: str, fn: Callable, fn_kwargs: Optional[dict] = None):
        self._backend = backend
        self._job_id = job_id
        self._fn = fn
        self._fn_kwargs = fn_kwargs or {}
        self._result = None
        self._time_per_step = {"CREATED": time.time()}

    def job_id(self) -> str:
        """Job identifier."""
        return self._job_id

    def backend(self):
        """The backend the job ran on."""
        return self._backend

    def submit(self):
        """Run the simulation (synchronously).

        Raises:
            DynamicsError: if the job was already submitted.
        """
        if self._result is not None:
            raise DynamicsError("Dynamics job has already been submitted.")
        self._time_per_step["RUNNING"] = time.time()
        self._result = self._fn(job_id=self._job_id, **self._fn_kwargs)
        self._time_per_step["COMPLETED"] = time.time()

    def result(self):
        """Return the result; requires ``submit`` to have been called."""
        if self._result is None:
            raise DynamicsError("Job has not been submitted.")
        return self._result

    def status(self) -> str:
        """Job status string."""
        return JobStatus.DONE if self._result is not None else JobStatus.INITIALIZING

    def time_per_step(self) -> dict:
        """Timestamps for each stage of the job."""
        return self._time_per_step.copy()
