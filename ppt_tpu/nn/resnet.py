"""Thin torchvision-style ResNet in flax (NHWC).

Reference: ``openpoints/models/backbone/resnet.py:1-341`` — the
torchvision ResNet parameterized by ``feature_size`` (stem width) so
SimpleView can run a 16-channel ResNet18 over 6 depth maps.

Only what SimpleView consumes is first-class: ``BasicBlock``, the
``layers`` stage plan, ``zero_init_residual`` (final BN gamma = 0), and
the truncated form (stages + global avg pool, no 7x7 stem / maxpool /
fc — ``simpleview.py:137-151`` drops those). ``Bottleneck`` is included
for the full resnet50-style builder.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn(name: str, zero_init: bool = False):
    return nn.BatchNorm(
        use_running_average=None, dtype=jnp.float32, momentum=0.9,
        epsilon=1e-5, name=name,
        scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
    )


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (``resnet.py`` BasicBlock, expansion 1)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    zero_init_residual: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = _bn("bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = _bn("bn2", zero_init=self.zero_init_residual)(
            h, use_running_average=not train
        )
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            identity = _bn("ds_bn")(identity, use_running_average=not train)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    """1x1 - 3x3 - 1x1 block (expansion 4)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    zero_init_residual: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = _bn("bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = _bn("bn2")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn("bn3", zero_init=self.zero_init_residual)(
            h, use_running_average=not train
        )
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            identity = _bn("ds_bn")(identity, use_running_average=not train)
        return nn.relu(h + identity)


class ResNetStages(nn.Module):
    """layer1..layer4 + global average pool — the part of the reference
    ResNet that SimpleView keeps (``simpleview.py:141-151``).

    Input: [B, H, W, C] with C == feature_size (the stem conv lives in
    the consumer). Output: [B, feature_size * 8 * expansion].
    """

    layers: Tuple[int, ...] = (2, 2, 2, 2)
    feature_size: int = 64
    block: str = "basic"  # 'basic' | 'bottleneck'
    zero_init_residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        inplanes = self.feature_size
        for stage, n_blocks in enumerate(self.layers):
            planes = self.feature_size * 2**stage
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes, stride=s, downsample=need_ds,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(x, train)
            inplanes = planes * expansion
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
