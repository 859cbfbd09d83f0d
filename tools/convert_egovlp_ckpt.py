"""Thin wrapper: the converter lives in cone_tpu.models.egovlp so package
code (extract/egovlp_video.py) can import it without path hacks."""

from cone_tpu.models.egovlp import egovlp_state_dict_to_params  # noqa: F401
