class _Constexpr:
    def __getitem__(self, item):
        return self
constexpr = _Constexpr()
def _noop(*a, **k):
    raise RuntimeError("triton stub: kernels cannot run")
program_id = arange = load = store = _noop


class dtype:  # torch._dynamo probes triton.language.dtype at optimizer init
    def __init__(self, *a, **k):
        pass
