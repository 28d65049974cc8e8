"""RPN backbone: top-down 2-D conv pyramid + upsample-and-concat
(SURVEY.md section 2 'RPN backbone'; PointPillars paper section 2.2).

Three down blocks (stride 2 each; layer counts/channels from config), each
deconvolved back to the head stride and concatenated. Plain nn.Conv /
nn.ConvTranspose — XLA tiles these onto the MXU; this is the bulk of the
detector's FLOPs (hot loop #3 in SURVEY.md 3.1). NHWC layout throughout
(TPU-native). Conv padding is explicit (1,1) so the torch CPU reference
(reference_cpu.model) computes the identical function for parity tests.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """`layers` x [3x3 conv + BN + ReLU]; first conv has `stride`."""

    channels: int
    layers: int
    stride: int = 2
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            stride = self.stride if i == 0 else 1
            x = nn.Conv(
                self.channels, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                axis_name=self.axis_name, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class UpBlock(nn.Module):
    """ConvTranspose(k=stride, s=stride, VALID) + BN + ReLU — exact integer
    upsample, mirrors torch ConvTranspose2d(k=s, stride=s)."""

    channels: int
    stride: int
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.channels, (self.stride, self.stride),
            strides=(self.stride, self.stride), padding="VALID",
            use_bias=False, dtype=self.dtype, name="deconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.99, epsilon=1e-3, dtype=self.dtype,
            axis_name=self.axis_name, name="bn",
        )(x)
        return nn.relu(x)


class RPNBackbone(nn.Module):
    """(H, W, C_in) BEV canvas -> (H/2, W/2, 3*up_channels) feature map.

    remat=True checkpoints each Conv/Up block (training-memory lever,
    SURVEY.md section 7 hard part d / VERDICT r2 item 9): only block
    boundaries are saved for the backward pass instead of every
    (H, W, C) conv activation — the RPN's intermediates are the largest
    training tensors (~160 MB each at full size, x16 layers). Parameter
    names and numerics are unchanged (remat re-executes the same ops)."""

    channels: Sequence[int] = (64, 128, 256)
    layers: Sequence[int] = (4, 6, 6)
    up_channels: int = 128
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # psum BN batch stats over this mesh axis under shard_map (sync-BN)
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        conv_cls = nn.remat(ConvBlock) if self.remat else ConvBlock
        up_cls = nn.remat(UpBlock) if self.remat else UpBlock
        ups = []
        for i, (ch, n) in enumerate(zip(self.channels, self.layers)):
            x = conv_cls(
                ch, n, stride=2,
                use_running_average=self.use_running_average,
                dtype=self.dtype, axis_name=self.axis_name,
                name=f"block{i}",
            )(x)
            # block i sits at stride 2^(i+1); head lives at stride 2
            ups.append(
                up_cls(
                    self.up_channels, 2 ** i,
                    use_running_average=self.use_running_average,
                    dtype=self.dtype, axis_name=self.axis_name,
                    name=f"up{i}",
                )(x)
            )
        return jnp.concatenate(ups, axis=-1)
