"""Box coders (JAX, vectorized, static shapes).

Behavior parity with ``pcdet/utils/box_coder_utils.py``:

* ``PointResidualCoder``            — reference :144-221
* ``PointResidual_BinOri_Coder``    — reference :224-319 (the PDA-SSD coder:
  xyz/size residuals against per-class mean sizes plus 12-bin orientation
  classification with in-bin residual; code_size = 6 + 2*12 = 30).

Unlike the reference these are pure functions over arrays of any leading
shape; `encode` takes padded (..., N) point sets with a validity mask
implied by ``gt_classes >= 1`` (rows with class 0 produce garbage that the
caller masks out, mirroring the reference's boolean-indexed gather).
"""

import numpy as np

import jax.numpy as jnp


class PointResidual_BinOri_Coder:
    """xyz/size residual + binned-orientation coder (reference :224-319)."""

    def __init__(self, use_mean_size=True, angle_bin_num=12, mean_size=None, **kwargs):
        self.bin_size = int(kwargs.get("bin_size", angle_bin_num))
        self.code_size = 6 + 2 * self.bin_size
        self.bin_inter = 2 * np.pi / self.bin_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            ms = np.asarray(mean_size, dtype=np.float32)
            assert ms.min() > 0
            self.mean_size = jnp.asarray(ms)

    def _anchor_sizes(self, classes):
        """classes: (..., ) int in [1, num_class] -> (..., 3) mean sizes."""
        idx = jnp.clip(classes.astype(jnp.int32) - 1, 0, self.mean_size.shape[0] - 1)
        return self.mean_size[idx]

    def encode(self, gt_boxes, points, gt_classes=None):
        """(..., 7+) gt boxes x (..., 3) points -> (..., 8) [xt..dzt, bin_id, bin_res].

        Reference ``encode_torch`` (:236-278).  Box extents are clamped to
        1e-5 to keep logs finite on padded rows.
        """
        sizes = jnp.maximum(gt_boxes[..., 3:6], 1e-5)
        xyz_g = gt_boxes[..., 0:3]
        rg = jnp.clip(gt_boxes[..., 6], -np.pi + 1e-5, np.pi - 1e-5)

        if self.use_mean_size:
            anchor = self._anchor_sizes(gt_classes)
            diagonal = jnp.sqrt(anchor[..., 0] ** 2 + anchor[..., 1] ** 2)
            xt = (xyz_g[..., 0] - points[..., 0]) / diagonal
            yt = (xyz_g[..., 1] - points[..., 1]) / diagonal
            zt = (xyz_g[..., 2] - points[..., 2]) / anchor[..., 2]
            dt = jnp.log(sizes / anchor)
        else:
            xt = xyz_g[..., 0] - points[..., 0]
            yt = xyz_g[..., 1] - points[..., 1]
            zt = xyz_g[..., 2] - points[..., 2]
            dt = jnp.log(sizes)

        bin_id = jnp.floor((rg + np.pi) / self.bin_inter)
        bin_res = ((rg + np.pi) - (bin_id * self.bin_inter + self.bin_inter / 2)) / (
            self.bin_inter / 2
        )
        return jnp.concatenate(
            [
                jnp.stack([xt, yt, zt], axis=-1),
                dt,
                bin_id[..., None],
                bin_res[..., None],
            ],
            axis=-1,
        )

    def decode(self, box_encodings, points, pred_classes=None):
        """(..., 30) encodings x (..., 3) points -> (..., 7) boxes.

        Reference ``decode_torch`` (:280-319): argmax orientation bin +
        selected in-bin residual.
        """
        xt, yt, zt = (box_encodings[..., i] for i in range(3))
        dt = box_encodings[..., 3:6]
        if self.use_mean_size:
            anchor = self._anchor_sizes(pred_classes)
            diagonal = jnp.sqrt(anchor[..., 0] ** 2 + anchor[..., 1] ** 2)
            xg = xt * diagonal + points[..., 0]
            yg = yt * diagonal + points[..., 1]
            zg = zt * anchor[..., 2] + points[..., 2]
            dg = jnp.exp(dt) * anchor
        else:
            xg = xt + points[..., 0]
            yg = yt + points[..., 1]
            zg = zt + points[..., 2]
            dg = jnp.exp(dt)

        bin_logits = box_encodings[..., 6 : 6 + self.bin_size]
        bin_res_all = box_encodings[..., 6 + self.bin_size :]
        bin_id = jnp.argmax(bin_logits, axis=-1)
        bin_res = jnp.take_along_axis(bin_res_all, bin_id[..., None], axis=-1)[..., 0]
        rg = (
            bin_id.astype(jnp.float32) * self.bin_inter
            - np.pi
            + self.bin_inter / 2
            + bin_res * (self.bin_inter / 2)
        )
        return jnp.concatenate(
            [jnp.stack([xg, yg, zg], axis=-1), dg, rg[..., None]], axis=-1
        )


class PointResidualCoder:
    """Plain 8-dim residual coder with cos/sin heading (reference :144-221)."""

    def __init__(self, code_size=8, use_mean_size=True, mean_size=None, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = jnp.asarray(np.array(mean_size), dtype=jnp.float32)

    def _anchor_sizes(self, classes):
        idx = jnp.clip(classes.astype(jnp.int32) - 1, 0, self.mean_size.shape[0] - 1)
        return self.mean_size[idx]

    def encode(self, gt_boxes, points, gt_classes=None):
        sizes = jnp.maximum(gt_boxes[..., 3:6], 1e-5)
        rg = gt_boxes[..., 6]
        if self.use_mean_size:
            anchor = self._anchor_sizes(gt_classes)
            diagonal = jnp.sqrt(anchor[..., 0] ** 2 + anchor[..., 1] ** 2)
            xt = (gt_boxes[..., 0] - points[..., 0]) / diagonal
            yt = (gt_boxes[..., 1] - points[..., 1]) / diagonal
            zt = (gt_boxes[..., 2] - points[..., 2]) / anchor[..., 2]
            dt = jnp.log(sizes / anchor)
        else:
            xt = gt_boxes[..., 0] - points[..., 0]
            yt = gt_boxes[..., 1] - points[..., 1]
            zt = gt_boxes[..., 2] - points[..., 2]
            dt = jnp.log(sizes)
        return jnp.concatenate(
            [
                jnp.stack([xt, yt, zt], axis=-1),
                dt,
                jnp.cos(rg)[..., None],
                jnp.sin(rg)[..., None],
            ],
            axis=-1,
        )

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt = (box_encodings[..., i] for i in range(3))
        dt = box_encodings[..., 3:6]
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        if self.use_mean_size:
            anchor = self._anchor_sizes(pred_classes)
            diagonal = jnp.sqrt(anchor[..., 0] ** 2 + anchor[..., 1] ** 2)
            xg = xt * diagonal + points[..., 0]
            yg = yt * diagonal + points[..., 1]
            zg = zt * anchor[..., 2] + points[..., 2]
            dg = jnp.exp(dt) * anchor
        else:
            xg = xt + points[..., 0]
            yg = yt + points[..., 1]
            zg = zt + points[..., 2]
            dg = jnp.exp(dt)
        rg = jnp.arctan2(sint, cost)
        return jnp.concatenate(
            [jnp.stack([xg, yg, zg], axis=-1), dg, rg[..., None]], axis=-1
        )


class ResidualCoder:
    """Anchor-based 7-dim residual coder (reference :5-76): xy residuals
    normalized by the anchor BEV diagonal, log size ratios, raw angle
    residual (sin-difference applied in the anchor-head loss)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """(..., 7+) gt boxes x (..., 7+) anchors -> (..., code_size)."""
        anchors_d = jnp.maximum(anchors[..., 3:6], 1e-5)
        boxes_d = jnp.maximum(boxes[..., 3:6], 1e-5)
        diagonal = jnp.sqrt(anchors_d[..., 0] ** 2 + anchors_d[..., 1] ** 2)
        xt = (boxes[..., 0] - anchors[..., 0]) / diagonal
        yt = (boxes[..., 1] - anchors[..., 1]) / diagonal
        zt = (boxes[..., 2] - anchors[..., 2]) / anchors_d[..., 2]
        dt = jnp.log(boxes_d / anchors_d)
        if self.encode_angle_by_sincos:
            tail = [
                jnp.cos(boxes[..., 6]) - jnp.cos(anchors[..., 6]),
                jnp.sin(boxes[..., 6]) - jnp.sin(anchors[..., 6]),
            ]
        else:
            tail = [boxes[..., 6] - anchors[..., 6]]
        extras = [boxes[..., 7 + i] - anchors[..., 7 + i]
                  for i in range(boxes.shape[-1] - 7)]
        return jnp.concatenate(
            [jnp.stack([xt, yt, zt], -1), dt,
             jnp.stack(tail, -1)] + ([jnp.stack(extras, -1)] if extras else []),
            axis=-1,
        )

    def decode(self, encodings, anchors):
        anchors_d = anchors[..., 3:6]
        diagonal = jnp.sqrt(anchors_d[..., 0] ** 2 + anchors_d[..., 1] ** 2)
        xg = encodings[..., 0] * diagonal + anchors[..., 0]
        yg = encodings[..., 1] * diagonal + anchors[..., 1]
        zg = encodings[..., 2] * anchors_d[..., 2] + anchors[..., 2]
        dg = jnp.exp(encodings[..., 3:6]) * anchors_d
        if self.encode_angle_by_sincos:
            rg_cos = encodings[..., 6] + jnp.cos(anchors[..., 6])
            rg_sin = encodings[..., 7] + jnp.sin(anchors[..., 6])
            rg = jnp.arctan2(rg_sin, rg_cos)
            rest = 8
        else:
            rg = encodings[..., 6] + anchors[..., 6]
            rest = 7
        extras = [encodings[..., rest + i] + anchors[..., 7 + i]
                  for i in range(anchors.shape[-1] - 7)]
        return jnp.concatenate(
            [jnp.stack([xg, yg, zg], -1), dg, rg[..., None]]
            + ([jnp.stack(extras, -1)] if extras else []),
            axis=-1,
        )


def build_box_coder(name, config):
    coders = {
        "PointResidual_BinOri_Coder": PointResidual_BinOri_Coder,
        "PointResidualCoder": PointResidualCoder,
        "ResidualCoder": ResidualCoder,
    }
    return coders[name](**config)
