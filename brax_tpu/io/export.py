"""Policy export for serving: jax2tf -> tf.saved_model.

Parity: /root/reference/brax/io/export.py:37-52.
"""


def to_tf_model(path: str, inference_fn, *trace_args):
    """Exports a policy inference function as a TensorFlow SavedModel."""
    # deferred imports: tensorflow is heavy and only needed for export
    from jax.experimental import jax2tf
    import tensorflow as tf

    model = tf.Module()
    model.f = tf.function(jax2tf.convert(inference_fn), autograph=False)
    # warm the concrete function so variables/signatures are materialized
    model.f(*trace_args)
    tf.saved_model.save(model, path)
