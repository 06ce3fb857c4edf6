"""RPN neck: 2D conv FPN over the BEV canvas.

Capability parity with reference ``det3d/models/necks/rpn.py:22-158``: per-stage
downsample blocks (stride conv + N 3x3 convs, BN eps 1e-3) and transpose-conv upsample
deblocks whose outputs are concatenated. NHWC layout for the MXU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tdal.models.layers import ConvBNReLU, DeconvBNReLU


class RPN(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    ds_layer_strides: Sequence[int] = (1, 2, 2)
    ds_num_filters: Sequence[int] = (64, 128, 256)
    us_layer_strides: Sequence[float] = (1, 2, 4)
    us_num_filters: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype = jnp.float32

    @property
    def downsample_factor(self) -> int:
        factor = int(np.prod(self.ds_layer_strides))
        if len(self.us_layer_strides) > 0:
            factor //= int(self.us_layer_strides[-1])
        return max(factor, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ups = []
        up_start = len(self.layer_nums) - len(self.us_num_filters)
        for i, n_layers in enumerate(self.layer_nums):
            # Chained trunk: each layer emits its RAW conv output + BN affine;
            # the normalize+ReLU is applied on the NEXT conv's input side in
            # VMEM (tdal.ops.pallas_conv.conv3x3_act_stats), so normalized
            # activations never round-trip HBM. One materialize per stage.
            # A stride-1 stage entry (stage 1 in the reference config) joins
            # the chain; strided entries are nn.Conv and must materialize.
            entry = ConvBNReLU(
                self.ds_num_filters[i],
                stride=self.ds_layer_strides[i],
                dtype=self.dtype,
            )
            if self.ds_layer_strides[i] == 1:
                x, pre = entry(x, train, emit_raw=True)
            else:
                x, pre = entry(x, train), None
            for _ in range(n_layers):
                x, pre = ConvBNReLU(self.ds_num_filters[i], dtype=self.dtype)(
                    x, train, pre=pre, emit_raw=True
                )
            if pre is not None:
                x = nn.relu(
                    x.astype(self.dtype) * pre[0].astype(self.dtype)
                    + pre[1].astype(self.dtype)
                )
            j = i - up_start
            if j >= 0:
                stride = self.us_layer_strides[j]
                if stride >= 1:
                    ups.append(
                        DeconvBNReLU(
                            self.us_num_filters[j], stride=int(stride), dtype=self.dtype
                        )(x, train)
                    )
                else:
                    ups.append(
                        DeconvBNReLU(
                            self.us_num_filters[j],
                            stride=int(round(1 / stride)),
                            downsample=True,
                            dtype=self.dtype,
                        )(x, train)
                    )
        if ups:
            x = jnp.concatenate(ups, axis=-1)
        return x
