import sys, types, warnings
def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items(): setattr(m, k, v)
    sys.modules[name] = m
    return m
_mod('trimesh'); _mod('trimesh.exchange')
_mod('trimesh.exchange.load', load_mesh=lambda *a, **k: None)
_mod('jax.experimental.host_callback', call=lambda *a, **k: None)
gym = _mod('gym', Env=object, Space=object)
_mod('gym.spaces', Box=object)
gym.spaces = sys.modules['gym.spaces']
gym.vector = _mod('gym.vector', VectorEnv=object)
_mod('dm_env', Environment=object, TimeStep=None, StepType=None)
_mod('dm_env.specs', Array=object, BoundedArray=object)
import jax
import jax.interpreters.batching as batching
from jax._src.interpreters import batching as _b
batching.__dict__['BatchTracer'] = _b.BatchTracer
sys.path.insert(0, '/root/reference')
warnings.filterwarnings('ignore')
_mod('gym.vector.utils', batch_space=lambda *a, **k: None)
sys.modules['gym.vector'].utils = sys.modules['gym.vector.utils']
import jax._src.core as _core
class _FakeSublevel:
    @property
    def level(self):
        return 0 if _core.trace_state_clean() else 1
jax.core.__dict__['cur_sublevel'] = lambda: _FakeSublevel()
