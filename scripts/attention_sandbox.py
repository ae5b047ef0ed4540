"""Scratchpad for exercising the image-attention modules at toy shapes.

Equivalent of the reference's root-level attention_sandbox.py (a ~17-line
torch scratchpad that builds zero tensors and calls an attention
mechanism's forward).  Here the same experiment drives all three JAX
image-attention modules (feedforward / multiplicative / bottom-up,
models/attention.py) so their shapes and jit behaviour can be poked at
interactively:

    python scripts/attention_sandbox.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from speaker_follower_tpu.models import attention as att

batch_size = 20
feature_size = 10
h = 5
w = 4
context_size = 15
hidden_size = 6
num_objects = 7


def forward(apply_fn, params, feature):
    context = jnp.zeros((batch_size, context_size))
    return jax.jit(apply_fn)(params, feature, context)


def main():
    key = jax.random.PRNGKey(0)
    conv_feature = jnp.zeros((batch_size, feature_size, h, w))

    p = att.feedforward_image_attention_init(
        key, context_size, hidden_size, image_feature_size=feature_size
    )
    weighted, attn = forward(att.feedforward_image_attention, p, conv_feature)
    print("feedforward:", weighted.shape, attn.shape)

    p = att.multiplicative_image_attention_init(
        key, context_size, hidden_size, image_feature_size=feature_size
    )
    weighted, attn = forward(att.multiplicative_image_attention, p, conv_feature)
    print("multiplicative:", weighted.shape, attn.shape)

    from speaker_follower_tpu.data.bottom_up import BottomUpViewpoint

    p = att.bottom_up_image_attention_init(
        key,
        context_size,
        object_embedding_size=8,
        attribute_embedding_size=8,
        hidden_size=hidden_size,
        num_objects=num_objects,
        num_attributes=num_objects,
        image_feature_size=feature_size,
    )
    bu = BottomUpViewpoint(
        cls_prob=jnp.zeros((batch_size, num_objects)),
        image_features=jnp.zeros((batch_size, num_objects, feature_size)),
        attribute_indices=jnp.zeros((batch_size, num_objects), jnp.int32),
        object_indices=jnp.zeros((batch_size, num_objects), jnp.int32),
        spatial_features=jnp.zeros((batch_size, num_objects, 5)),
        no_object_mask=jnp.zeros((batch_size, num_objects), bool),
    )
    weighted, attn = jax.jit(att.bottom_up_image_attention)(
        p, bu, jnp.zeros((batch_size, context_size))
    )
    print("bottom_up:", weighted.shape, attn.shape)


if __name__ == "__main__":
    main()
