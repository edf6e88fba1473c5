"""DETR panoptic segmentation machinery — Flax NHWC rebuild of the dormant
reference components (/root/reference/CLTR/segmentation.py:224-370 plus
DETRsegm/MaskHeadSmallConv/MHAttentionMap at :31-178).

The reference ships these but never constructs them (`masks: false`,
CLTRconfig.yml:46); they are rebuilt here so the capability exists end to end:
DETRsegm produces per-query masks on top of the conditional-DETR stack, and
the two postprocessors turn model outputs into COCO-style results.  The live
dice/focal losses the criterion uses stay in criterion.py (:30-52).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unet_torch_tpu.models.cltr.backbone import ResNet50
from unet_torch_tpu.models.cltr.model import inverse_sigmoid
from unet_torch_tpu.models.cltr.position_encoding import (
    sine_position_embedding,
)
from unet_torch_tpu.models.cltr.transformer import MLP, Transformer

xavier_uniform = nn.initializers.xavier_uniform()


class MHAttentionMap(nn.Module):
    """2D attention map module (ref :147-178): returns the per-head softmax
    attention of each query over the feature map — no value multiply.

    q: (B, Q, D); k: (B, H, W, D) -> weights (B, Q, heads, H, W).
    """

    hidden_dim: int
    num_heads: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, q, k, mask: Optional[jnp.ndarray] = None, *,
                 train: bool = False):
        q = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform,
                     name="q_linear")(q)
        # ref applies k_linear as a 1x1 conv (:169); on NHWC that's a Dense
        k = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform,
                     name="k_linear")(k)
        b, nq, _ = q.shape
        _, h, w, _ = k.shape
        ch = self.hidden_dim // self.num_heads
        qh = q.reshape(b, nq, self.num_heads, ch)
        kh = k.reshape(b, h, w, self.num_heads, ch)
        norm = float(ch) ** -0.5
        weights = jnp.einsum("bqnc,bhwnc->bqnhw", qh * norm, kh)
        if mask is not None:
            weights = jnp.where(mask[:, None, None, :, :], -jnp.inf, weights)
        weights = jax.nn.softmax(weights.reshape(b, nq, self.num_heads, -1),
                                 axis=-1).reshape(weights.shape)
        if self.dropout_rate and train:
            weights = nn.Dropout(self.dropout_rate, deterministic=False)(
                weights)
        return weights


def _gn(x, name):
    # 8 groups at reference widths (context_dim 256 -> d/16=16); gcd keeps
    # tiny smoke-test widths valid where torch GroupNorm(8, C<8) would raise
    groups = math.gcd(8, x.shape[-1])
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)(x)


def _nearest_to(x, hw):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), "nearest")


class MaskHeadSmallConv(nn.Module):
    """FPN-style mask head (ref :77-145): conv/GN/ReLU ladder, nearest 2x
    upsampling, 1x1 adapters on the three FPN skips, 1-channel output.

    x: (BQ, H, W, dim); fpns: three NHWC maps at 2x/4x/8x resolution,
    already expanded to BQ on the leading axis by the caller.
    """

    context_dim: int

    @nn.compact
    def __call__(self, x, fpns: Sequence[jnp.ndarray]):
        d = self.context_dim
        inter = [d // 2, d // 4, d // 8, d // 16]
        conv_init = nn.initializers.variance_scaling(
            1.0, "fan_in", "uniform")  # torch kaiming_uniform_(a=1) (:105)

        def conv(x, feats, name):
            return nn.Conv(feats, (3, 3), padding=1, kernel_init=conv_init,
                           bias_init=nn.initializers.zeros, name=name)(x)

        x = nn.relu(_gn(conv(x, x.shape[-1], "lay1"), "gn1"))
        x = nn.relu(_gn(conv(x, inter[0], "lay2"), "gn2"))
        for i, fpn in enumerate(fpns):
            adapter = nn.Conv(inter[i], (1, 1), kernel_init=conv_init,
                              bias_init=nn.initializers.zeros,
                              name=f"adapter{i + 1}")(fpn)
            x = adapter + _nearest_to(x, adapter.shape[1:3])
            x = nn.relu(_gn(conv(x, inter[i + 1] if i + 1 < len(inter)
                                 else inter[-1], f"lay{i + 3}"),
                            f"gn{i + 3}"))
        return nn.Conv(1, (3, 3), padding=1, kernel_init=conv_init,
                       bias_init=nn.initializers.zeros, name="out_lay")(x)


class DETRsegm(nn.Module):
    """Conditional-DETR detector + panoptic mask head (ref DETRsegm :31-69).

    Returns {'pred_logits', 'pred_points', 'pred_masks' (B, Q, H/8, W/8)}.
    """

    num_classes: int = 2
    num_queries: int = 100
    channel_point: int = 3
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, mask=None, *, train: bool = False):
        feats = ResNet50(dtype=self.dtype, return_interm=True,
                         name="backbone")(images)
        l1, l2, l3, l4 = feats
        b, fh, fw, _ = l4.shape
        if mask is None:
            fmask = jnp.zeros((b, fh, fw), bool)
        else:
            fmask = jax.image.resize(mask.astype(jnp.float32), (b, fh, fw),
                                     "nearest") > 0.5
        pos = sine_position_embedding(fmask, self.hidden_dim // 2)
        src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                      name="input_proj")(l4)
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (self.num_queries, self.hidden_dim))
        hs, reference, memory = Transformer(
            self.hidden_dim, self.nheads, self.enc_layers, self.dec_layers,
            self.dim_feedforward, self.dropout_rate, return_memory=True,
            name="transformer")(src, fmask, query_embed, pos, train=train)

        ref_before_sigmoid = inverse_sigmoid(reference)
        prior = -math.log((1 - 0.01) / 0.01)
        logits = nn.Dense(self.num_classes,
                          bias_init=nn.initializers.constant(prior),
                          name="class_embed")(hs[-1])
        tmp = MLP(self.hidden_dim, self.channel_point, 3,
                  last_zero_init=True, name="point_embed")(hs[-1])
        tmp = tmp.at[..., :2].add(ref_before_sigmoid)
        points = jax.nn.sigmoid(tmp)

        bbox_mask = MHAttentionMap(self.hidden_dim, self.nheads,
                                   name="bbox_attention")(
            hs[-1], memory, mask=fmask, train=train)  # (B,Q,n,fh,fw)

        nq = self.num_queries
        x = jnp.repeat(src, nq, axis=0)  # (B*Q, fh, fw, D)
        bm = bbox_mask.transpose(0, 1, 3, 4, 2).reshape(
            b * nq, fh, fw, self.nheads)
        x = jnp.concatenate([x, bm], axis=-1)
        fpns = [jnp.repeat(f, nq, axis=0) for f in (l3, l2, l1)]
        seg = MaskHeadSmallConv(self.hidden_dim, name="mask_head")(x, fpns)
        masks = seg.reshape(b, nq, seg.shape[1], seg.shape[2])

        return {"pred_logits": logits, "pred_points": points,
                "pred_masks": masks}


# ---------------------------------------------------------------------------
# postprocessors (host-side numpy — ref :224-370)
# ---------------------------------------------------------------------------

def postprocess_segm(results, outputs, orig_target_sizes, max_target_sizes,
                     threshold: float = 0.5):
    """ref PostProcessSegm.forward (:224-245): bilinear-resize the predicted
    masks to the padded size, threshold at ``threshold``, crop to each
    image's unpadded size, nearest-resize to the original size."""
    max_h = max(int(t[0]) for t in max_target_sizes)
    max_w = max(int(t[1]) for t in max_target_sizes)
    masks = jnp.asarray(outputs["pred_masks"])
    b, q = masks.shape[:2]
    up = jax.image.resize(masks, (b, q, max_h, max_w), "bilinear")
    binm = np.asarray(jax.nn.sigmoid(up) > threshold)
    for i, (t, tt) in enumerate(zip(max_target_sizes, orig_target_sizes)):
        img_h, img_w = int(t[0]), int(t[1])
        cur = binm[i][:, :img_h, :img_w].astype(np.float32)
        out_h, out_w = int(tt[0]), int(tt[1])
        cur = np.asarray(jax.image.resize(jnp.asarray(cur),
                                          (q, out_h, out_w), "nearest"))
        results[i]["masks"] = cur.astype(np.uint8)[:, None]
    return results


def postprocess_panoptic(outputs, processed_sizes, target_sizes=None,
                         is_thing_map=None, threshold: float = 0.85):
    """ref PostProcessPanoptic.forward (:247-370): per image, keep confident
    non-background queries, argmax-merge their masks into one id map, merge
    stuff classes, drop segments <= 4 px (re-merging after each drop), and
    emit {'png_string', 'segments_info'}."""
    import cv2

    if target_sizes is None:
        target_sizes = processed_sizes
    logits = np.asarray(outputs["pred_logits"])
    raw_masks = np.asarray(outputs["pred_masks"])
    if is_thing_map is None:
        is_thing_map = {i: True for i in range(logits.shape[-1])}
    preds = []
    for cur_logits, cur_masks, size, target_size in zip(
            logits, raw_masks, processed_sizes, target_sizes):
        e = np.exp(cur_logits - cur_logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        scores, labels = probs.max(-1), probs.argmax(-1)
        keep = (labels != logits.shape[-1] - 1) & (scores > threshold)
        cur_scores, cur_classes = scores[keep], labels[keep]
        h, w = int(size[0]), int(size[1])
        kept = cur_masks[keep]
        if kept.size:
            kept = np.stack([cv2.resize(m, (w, h),
                                        interpolation=cv2.INTER_LINEAR)
                             for m in kept])
        else:
            kept = np.zeros((0, h, w), np.float32)

        stuff_equiv = {}
        for k, label in enumerate(cur_classes):
            if not is_thing_map.get(int(label), True):
                stuff_equiv.setdefault(int(label), []).append(k)

        def get_ids_area(masks, scores, dedup=False):
            if masks.shape[0] == 0:
                m_id = np.zeros((h, w), np.int64)
            else:
                flat = masks.reshape(masks.shape[0], -1)
                em = np.exp(flat - flat.max(0, keepdims=True))
                m_id = (em / em.sum(0, keepdims=True)).argmax(0).reshape(h, w)
            if dedup:
                for equiv in stuff_equiv.values():
                    for eq_id in equiv[1:]:
                        m_id[m_id == eq_id] = equiv[0]
            fh, fw = int(target_size[0]), int(target_size[1])
            seg_img = cv2.resize(m_id.astype(np.int32), (fw, fh),
                                 interpolation=cv2.INTER_NEAREST)
            area = [int((seg_img == i).sum()) for i in range(len(scores))]
            return area, seg_img

        area, seg_img = get_ids_area(kept, cur_scores, dedup=True)
        if len(cur_classes):
            while True:
                small = np.asarray([area[i] <= 4
                                    for i in range(len(cur_classes))], bool)
                if small.any():
                    cur_scores = cur_scores[~small]
                    cur_classes = cur_classes[~small]
                    kept = kept[~small]
                    area, seg_img = get_ids_area(kept, cur_scores)
                else:
                    break
        else:
            cur_classes = np.ones(1, np.int64)
        segments_info = [{"id": i, "isthing": is_thing_map.get(int(c), True),
                          "category_id": int(c), "area": a}
                         for i, (a, c) in enumerate(zip(area, cur_classes))]
        # id map -> RGB png bytes (panopticapi id2rgb convention)
        rgb = np.stack([seg_img % 256, (seg_img // 256) % 256,
                        (seg_img // 256 ** 2) % 256], axis=-1).astype(np.uint8)
        ok, buf = cv2.imencode(".png", rgb[:, :, ::-1])  # cv2 writes BGR
        preds.append({"png_string": buf.tobytes() if ok else b"",
                      "segments_info": segments_info})
    return preds
