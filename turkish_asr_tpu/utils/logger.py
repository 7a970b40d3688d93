"""Logging — stdout + file handler, identical format/contract to the
reference (/root/reference/utils/logger.py:5-36)."""

import logging
import sys


def get_logger(name, log_file="train.log"):
    """Return a logger writing to both stdout and ``log_file``.

    Idempotent: handlers are only attached once per logger name.
    """
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)

    if not logger.handlers:
        formatter = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")

        stream_handler = logging.StreamHandler(sys.stdout)
        stream_handler.setFormatter(formatter)
        logger.addHandler(stream_handler)

        file_handler = logging.FileHandler(log_file, mode="a", encoding="utf-8")
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)

    return logger
