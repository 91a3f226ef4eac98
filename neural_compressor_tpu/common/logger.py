"""Logging for the TPU quantization engine.

Provides a process-wide ``logger`` honoring the ``LOGLEVEL`` env var and a
``TuningLogger`` emitting stage markers designed for log scraping.

Parity target: neural_compressor/common/utils/logger.py:50-220 (reference),
re-implemented from scratch.
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER_NAME = "neural_compressor_tpu"


def _build_logger() -> logging.Logger:
    log = logging.getLogger(_LOGGER_NAME)
    if log.handlers:
        return log
    level_name = os.environ.get("LOGLEVEL", "INFO").upper()
    level = getattr(logging, level_name, logging.INFO)
    log.setLevel(level)
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s [%(levelname)s][%(filename)s:%(lineno)d] %(message)s",
            datefmt="%Y-%m-%d %H:%M:%S",
        )
    )
    log.addHandler(handler)
    log.propagate = False
    return log


logger = _build_logger()


def set_log_level(level: int | str) -> None:
    if isinstance(level, str):
        level = getattr(logging, level.upper())
    logger.setLevel(level)


class TuningLogger:
    """Stage markers for the accuracy-driven tuning loop.

    The fixed strings are part of the observable contract (log scraping),
    mirroring the reference's tuning stage logs
    (common/utils/logger.py:176-220).
    """

    @classmethod
    def tuning_start(cls) -> None:
        logger.info("Tuning started.")

    @classmethod
    def trial_start(cls, trial_index: int) -> None:
        logger.info("%d-trial started.", trial_index)

    @classmethod
    def execution_start(cls) -> None:
        logger.info("Quantization started.")

    @classmethod
    def execution_end(cls) -> None:
        logger.info("Quantization end.")

    @classmethod
    def evaluation_start(cls) -> None:
        logger.info("Evaluation started.")

    @classmethod
    def evaluation_end(cls) -> None:
        logger.info("Evaluation end.")

    @classmethod
    def trial_end(cls, trial_index: int) -> None:
        logger.info("%d-trial end.", trial_index)

    @classmethod
    def tuning_end(cls) -> None:
        logger.info("Tuning completed.")
