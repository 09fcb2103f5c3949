import logging as _logging
logger = _logging.getLogger("loguru-shim")
logger.addHandler(_logging.NullHandler())
def _noop(*a, **k): pass
logger.add = _noop
logger.remove = _noop
