"""Torch -> JAX checkpoint converter for PDA-SSD parity testing.

Maps a reference PDANet/OpenPCDet ``.pth`` state_dict (torch layout) onto
this framework's flax variables for the same YAML config, so a trained
reference checkpoint can be evaluated here box-for-box (SURVEY.md §4e).

Layout translations:
  Conv1d/Conv2d 1x1 weight (out, in, 1[, 1]) -> Dense kernel (in, out)
  Linear weight (out, in)                    -> Dense kernel (in, out)
  BatchNorm weight/bias/running_mean/var     -> bn scale/bias + batch_stats
  nn.MultiheadAttention in_proj (3d, d)      -> flax MHA q/k/v kernels
                                                (d, heads, head_dim)
"""

import argparse
import pickle

import numpy as np


def _dense(w):
    w = np.asarray(w)
    if w.ndim == 4:  # Conv2d 1x1
        w = w[:, :, 0, 0]
    elif w.ndim == 3:  # Conv1d k=1
        w = w[:, :, 0]
    return w.T  # (in, out)


class TorchTree:
    """Flat state_dict with prefix-scoped access."""

    def __init__(self, sd, prefix=""):
        self.sd = sd
        self.prefix = prefix

    def sub(self, name):
        return TorchTree(self.sd, self.prefix + name + ".")

    def __getitem__(self, key):
        return np.asarray(self.sd[self.prefix + key])

    def __contains__(self, key):
        return (self.prefix + key) in self.sd


def _bn(tree, params, stats, name="bn"):
    params[name] = {"scale": tree["weight"], "bias": tree["bias"]}
    stats[name] = {"mean": tree["running_mean"], "var": tree["running_var"]}


def convert_mlp_stack(tree, num_layers, stride=3, start=0):
    """[Conv, BN, ReLU] x n sequential -> MLPStack params/batch_stats."""
    params, stats = {}, {}
    for j in range(num_layers):
        conv = tree.sub(str(start + stride * j))
        bn = tree.sub(str(start + stride * j + 1))
        lp, ls = {}, {}
        lp["dense"] = {"kernel": _dense(conv["weight"])}
        if "bias" in conv:
            lp["dense"]["bias"] = conv["bias"]
        _bn(bn, lp, ls)
        params[f"layer{j}"] = lp
        stats[f"layer{j}"] = ls
    return params, stats


def convert_attention(tree, d_model, nhead):
    """nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    hd = d_model // nhead
    in_w = tree["in_proj_weight"]  # (3d, d)
    in_b = tree["in_proj_bias"]  # (3d,)
    out = {}
    for i, name in enumerate(["query", "key", "value"]):
        w = in_w[i * d_model : (i + 1) * d_model]  # (d, d): (out, in)
        b = in_b[i * d_model : (i + 1) * d_model]
        out[name] = {
            "kernel": w.T.reshape(d_model, nhead, hd),
            "bias": b.reshape(nhead, hd),
        }
    wo = tree.sub("out_proj")["weight"]  # (d, d)
    bo = tree.sub("out_proj")["bias"]
    out["out"] = {"kernel": wo.T.reshape(nhead, hd, d_model), "bias": bo}
    return out


def convert_transformer_layer(tree, d_model, nhead):
    params = {
        "self_attn": convert_attention(tree.sub("self_attn"), d_model, nhead),
        "norm1": {"scale": tree.sub("norm1")["weight"], "bias": tree.sub("norm1")["bias"]},
        "norm2": {"scale": tree.sub("norm2")["weight"], "bias": tree.sub("norm2")["bias"]},
        "linear1": {"kernel": tree.sub("linear1")["weight"].T, "bias": tree.sub("linear1")["bias"]},
        "linear2": {"kernel": tree.sub("linear2")["weight"].T, "bias": tree.sub("linear2")["bias"]},
    }
    return params


def convert_densitynet(tree):
    params, stats = {}, {}
    for j in range(3):
        conv = tree.sub(f"mlp_convs.{j}")
        bn = tree.sub(f"mlp_bns.{j}")
        params[f"conv{j}"] = {"kernel": _dense(conv["weight"]), "bias": conv["bias"]}
        params[f"bn{j}"] = {"scale": bn["weight"], "bias": bn["bias"]}
        stats[f"bn{j}"] = {"mean": bn["running_mean"], "var": bn["running_var"]}
    return params, stats


def convert_fc_head(tree, fc_cfg):
    """make_fc_layers: [Linear(no bias), BN1d, ReLU] x n + Linear(bias).

    Returns (mlpstack params, mlpstack stats, final dense params).
    """
    params, stats = {}, {}
    for j in range(len(fc_cfg)):
        lin = tree.sub(str(3 * j))
        bn = tree.sub(str(3 * j + 1))
        lp = {"dense": {"kernel": lin["weight"].T}}
        ls = {}
        _bn(bn, lp, ls)
        params[f"layer{j}"] = lp
        stats[f"layer{j}"] = ls
    final = tree.sub(str(3 * len(fc_cfg)))
    return params, stats, {"kernel": final["weight"].T, "bias": final["bias"]}


def convert_sa_withsampling(tree, mlps, aggregation_mlp, confidence_mlp):
    params, stats = {}, {}
    for i, spec in enumerate(mlps):
        p, s = convert_mlp_stack(tree.sub(f"mlps.{i}"), len(spec) - 1)
        params[f"mlps_{i}"] = p
        stats[f"mlps_{i}"] = s
    if aggregation_mlp:
        p, s = convert_mlp_stack(tree.sub("aggregation_layer"), len(aggregation_mlp))
        params["aggregation_layer"] = p
        stats["aggregation_layer"] = s
    if confidence_mlp:
        p, s = convert_mlp_stack(tree.sub("confidence_layers"), len(confidence_mlp))
        params["confidence_mlp"] = p
        stats["confidence_mlp"] = s
        final = tree.sub(f"confidence_layers.{3 * len(confidence_mlp)}")
        params["confidence_out"] = {
            "kernel": _dense(final["weight"]), "bias": final["bias"],
        }
    return params, stats


def convert_sa_ellipsoid(tree, mlps, aggregation_mlp, confidence_mlp):
    params, stats = {}, {}
    for i, spec in enumerate(mlps):
        d = spec[0]
        p, s = convert_mlp_stack(tree.sub(f"position_mlp.{i}"), 2)
        params[f"position_mlp_{i}"], stats[f"position_mlp_{i}"] = p, s
        p, s = convert_mlp_stack(tree.sub(f"global_mlps.{i}"), 2)
        params[f"global_mlps_{i}"], stats[f"global_mlps_{i}"] = p, s
        p, s = convert_densitynet(tree.sub(f"point_density.{i}.densitynet"))
        params[f"point_density_{i}"], stats[f"point_density_{i}"] = p, s
        params[f"Local_pointformer_{i}"] = convert_transformer_layer(
            tree.sub(f"Local_pointformer.{i}"), 4 * d, 4
        )
        p, s = convert_mlp_stack(tree.sub(f"fin_conv.{i}"), 2)
        params[f"fin_conv_{i}"], stats[f"fin_conv_{i}"] = p, s
    if aggregation_mlp:
        p, s = convert_mlp_stack(tree.sub("aggregation_layer"), len(aggregation_mlp))
        params["aggregation_layer"], stats["aggregation_layer"] = p, s
    if confidence_mlp:
        p, s = convert_mlp_stack(tree.sub("confidence_layers"), len(confidence_mlp))
        params["confidence_mlp"], stats["confidence_mlp"] = p, s
        final = tree.sub(f"confidence_layers.{3 * len(confidence_mlp)}")
        params["confidence_out"] = {
            "kernel": _dense(final["weight"]), "bias": final["bias"],
        }
    return params, stats


def convert_vote_layer(tree, mlp_list):
    params, stats = {}, {}
    if mlp_list:
        p, s = convert_mlp_stack(tree.sub("mlp_modules"), len(mlp_list))
        params["mlp_modules"], stats["mlp_modules"] = p, s
    params["ctr_reg"] = {
        "kernel": _dense(tree.sub("ctr_reg")["weight"]),
        "bias": tree.sub("ctr_reg")["bias"],
    }
    return params, stats


def _conv2d_kernel(w):
    """torch Conv2d weight (out, in, kh, kw) -> flax Conv kernel
    (kh, kw, in, out)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _deconv2d_kernel(w):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, in, out).

    flax's ConvTranspose (transpose_kernel=False) runs an input-dilated
    correlation, which is the torch gradient-of-conv semantics with the
    spatial axes mirrored — so the taps are flipped here (verified by the
    activation-parity test in tests/test_converter.py)."""
    w = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return w[::-1, ::-1]


def convert_pillar_vfe(tree, num_filters):
    """PillarVFE pfn_layers.{i}.{linear,norm} (pillar_vfe.py PFNLayer) ->
    flax PFNLayer {linear, norm}."""
    params, stats = {}, {}
    for i in range(len(num_filters)):
        lt = tree.sub(f"pfn_layers.{i}")
        lp = {"linear": {"kernel": lt.sub("linear")["weight"].T}}
        if "linear.bias" in lt:
            lp["linear"]["bias"] = lt.sub("linear")["bias"]
        ls = {}
        if "norm.weight" in lt:
            _bn(lt.sub("norm"), lp, ls, name="norm")
        params[f"pfn_layers_{i}"] = lp
        stats[f"pfn_layers_{i}"] = ls
    return params, stats


def convert_bev_backbone(tree, cfg):
    """BaseBEVBackbone blocks.{i}/deblocks.{i} Sequentials
    (base_bev_backbone.py:30-80; ZeroPad2d offsets the first conv to
    index 1) -> flax blocks_{i}_down / blocks_{i}_{k} / deblocks_{i}_*."""
    layer_nums = list(cfg.get("LAYER_NUMS", []) or [])
    upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []) or [])
    params, stats = {}, {}

    def conv_bn(conv_tree, bn_tree, name, kernel_fn=_conv2d_kernel):
        lp = {"conv": {"kernel": kernel_fn(conv_tree["weight"])}}
        ls = {}
        _bn(bn_tree, lp, ls)
        params[name] = lp
        stats[name] = ls

    for idx in range(len(layer_nums)):
        bt = tree.sub(f"blocks.{idx}")
        conv_bn(bt.sub("1"), bt.sub("2"), f"blocks_{idx}_down")
        for k in range(layer_nums[idx]):
            conv_bn(bt.sub(str(4 + 3 * k)), bt.sub(str(5 + 3 * k)),
                    f"blocks_{idx}_{k}")
        if upsample_strides:
            dt = tree.sub(f"deblocks.{idx}")
            if upsample_strides[idx] >= 1:
                params[f"deblocks_{idx}_deconv"] = {
                    "kernel": _deconv2d_kernel(dt.sub("0")["weight"])
                }
            else:
                params[f"deblocks_{idx}_conv"] = {
                    "kernel": _conv2d_kernel(dt.sub("0")["weight"])
                }
            bp, bs = {}, {}
            _bn(dt.sub("1"), bp, bs)
            params[f"deblocks_{idx}_bn"] = bp["bn"]
            stats[f"deblocks_{idx}_bn"] = bs["bn"]
    if len(upsample_strides) > len(layer_nums):
        dt = tree.sub(f"deblocks.{len(layer_nums)}")
        params["deblocks_final_deconv"] = {
            "kernel": _deconv2d_kernel(dt.sub("0")["weight"])
        }
        bp, bs = {}, {}
        _bn(dt.sub("1"), bp, bs)
        params["deblocks_final_bn"] = bp["bn"]
        stats["deblocks_final_bn"] = bs["bn"]
    return params, stats


def convert_anchor_head_single(tree):
    """AnchorHeadSingle conv_cls/conv_box/conv_dir_cls 1x1 Conv2d
    (anchor_head_single.py:30-43) -> flax AnchorHeadSingleNet."""
    params = {}
    for name in ("conv_cls", "conv_box", "conv_dir_cls"):
        if f"{name}.weight" in tree:
            sub = tree.sub(name)
            params[name] = {
                "kernel": _conv2d_kernel(sub["weight"]),
                "bias": sub["bias"],
            }
    return params


def convert_voxel_backbone_dense(tree, widths, c_out, input_channels=4):
    """Reference VoxelBackBone8x (spconv_backbone.py:70-120) onto the
    DENSE flax analogue ``voxel_backbone.VoxelBackBone8x``.

    Structure note: the reference runs down + 2 subm blocks per level
    (conv2/3/4); the dense analogue runs down + 1 subm, so the SECOND
    subm block of each level (conv{L}.2.*) has no dense target and is
    dropped — dense conversion is approximate by design (the
    semantics-matching target is SparseVoxelBackBone8x).  conv{L}.1 maps
    onto the analogue's subm block."""

    def conv3d_kernel(w, cin, cout):
        """spconv Conv3d weight -> flax Conv kernel (k1, k2, k3, in, out).
        Accepts the layouts the reference's load shim handles
        (detector3d_template.py ckpt load):
          spconv 1.x            (k1, k2, k3, in, out)  — already flax layout
          spconv 2.x native     (k1, k2, k3, out, in)
          spconv 2.x implicit   (out, k1, k2, k3, in)
        Disambiguated by the caller-known (in, out) channel pair; when
        cin == cout the 1.x and 2.x-native layouts coincide shape-wise
        and 1.x is assumed (the published reference checkpoints)."""
        w = np.asarray(w)
        if w.shape[-2:] == (cin, cout):  # spconv 1.x == flax layout
            return w
        if w.shape[-2:] == (cout, cin):  # spconv 2.x native
            return np.swapaxes(w, -1, -2)
        if w.shape[0] == cout and w.shape[-1] == cin:  # implicit gemm
            return np.moveaxis(w, 0, -1).swapaxes(-1, -2)
        raise ValueError(
            f"unrecognized spconv weight shape {w.shape} for "
            f"cin={cin} cout={cout}")

    params, stats = {}, {}

    def seq(conv_tree, bn_tree, name, cin, cout):
        params[name] = {
            "Conv_0": {"kernel": conv3d_kernel(conv_tree["weight"],
                                               cin, cout)},
            "BatchNorm_0": {"scale": bn_tree["weight"],
                            "bias": bn_tree["bias"]},
        }
        stats[name] = {"BatchNorm_0": {"mean": bn_tree["running_mean"],
                                       "var": bn_tree["running_var"]}}

    # conv_input: SubM(Cin->w0); conv1: 1 subm block (w0->w1)
    seq(tree.sub("conv_input.0"), tree.sub("conv_input.1"), "conv_input",
        input_channels, widths[0])
    seq(tree.sub("conv1.0.0"), tree.sub("conv1.0.1"), "conv1",
        widths[0], widths[1])
    pairs = [("conv2", widths[1], widths[2]),
             ("conv3", widths[2], widths[3]),
             ("conv4", widths[3], widths[4])]
    for lvl, cin, cout in pairs:
        seq(tree.sub(f"{lvl}.0.0"), tree.sub(f"{lvl}.0.1"), f"{lvl}_down",
            cin, cout)
        seq(tree.sub(f"{lvl}.1.0"), tree.sub(f"{lvl}.1.1"), lvl,
            cout, cout)
    seq(tree.sub("conv_out.0"), tree.sub("conv_out.1"), "conv_out",
        widths[4], c_out)
    return params, stats


def convert_res_block3d(tree, name, params, stats):
    """SparseBasicBlock (spconv_backbone.py:30-67) -> flax ResBlock3D
    {conv1, bn1, conv2, bn2}.

    The reference's SubM convs inside the block carry a bias even though
    a BN follows (``bias = norm_fn is not None``, :38) — a redundant
    shift which is folded EXACTLY into the BN running mean here
    (BN(Wx + b) == BN'(Wx) with mean' = mean - b)."""
    p, s = {}, {}
    for conv_name, bn_name in (("conv1", "bn1"), ("conv2", "bn2")):
        ct, bt = tree.sub(conv_name), tree.sub(bn_name)
        p[conv_name] = {"kernel": np.asarray(ct["weight"])}
        mean = np.asarray(bt["running_mean"])
        if "bias" in ct:
            mean = mean - np.asarray(ct["bias"])
        p[bn_name] = {"scale": bt["weight"], "bias": bt["bias"]}
        s[bn_name] = {"mean": mean, "var": bt["running_var"]}
    params[name], stats[name] = p, s


def convert_voxel_res_backbone_dense(tree, input_channels=4):
    """Reference VoxelResBackBone8x (spconv_backbone.py:183-240) onto the
    dense flax ``voxel_backbone.VoxelResBackBone8x`` — a COMPLETE mapping
    (down block + 2 residual blocks per level on both sides): conv_input,
    conv1.{0,1} residual pair, conv{2..4}.0 down + .{1,2} residual pairs,
    conv_out.  spconv kernels (k,k,k,in,out) pass through; the in-block
    conv biases are folded into BN means (see convert_res_block3d)."""
    widths = [16, 16, 32, 64, 128]
    params, stats = {}, {}

    def seq(conv_tree, bn_tree, name):
        params[name] = {
            "Conv_0": {"kernel": np.asarray(conv_tree["weight"])},
            "BatchNorm_0": {"scale": bn_tree["weight"],
                            "bias": bn_tree["bias"]},
        }
        stats[name] = {"BatchNorm_0": {"mean": bn_tree["running_mean"],
                                       "var": bn_tree["running_var"]}}

    seq(tree.sub("conv_input.0"), tree.sub("conv_input.1"), "conv_input")
    convert_res_block3d(tree.sub("conv1.0"), "res1_a", params, stats)
    convert_res_block3d(tree.sub("conv1.1"), "res1_b", params, stats)
    for lvl in (2, 3, 4):
        seq(tree.sub(f"conv{lvl}.0.0"), tree.sub(f"conv{lvl}.0.1"),
            f"conv{lvl}_down")
        convert_res_block3d(tree.sub(f"conv{lvl}.1"), f"res{lvl}_a",
                            params, stats)
        convert_res_block3d(tree.sub(f"conv{lvl}.2"), f"res{lvl}_b",
                            params, stats)
    seq(tree.sub("conv_out.0"), tree.sub("conv_out.1"), "conv_out")
    return params, stats


def convert_center_head(tree, model_cfg, num_class_each_head):
    """CenterHead (center_head.py:11-101) -> flax CenterHeadNet:
    shared_conv Sequential + heads_list.{i} SeparateHeads, whose fc
    stacks are Sequentials of [Conv2d-BN-ReLU] Sequentials with a bare
    final Conv2d."""
    params, stats = {}, {}
    sc = tree.sub("shared_conv")
    p = {"kernel": _conv2d_kernel(sc.sub("0")["weight"])}
    if "0.bias" in sc:
        p["bias"] = sc.sub("0")["bias"]
    params["shared_conv"] = p
    bp, bs = {}, {}
    _bn(sc.sub("1"), bp, bs)
    params["shared_bn"], stats["shared_bn"] = bp["bn"], bs["bn"]

    head_dict = {k: dict(v) for k, v in
                 dict(model_cfg.SEPARATE_HEAD_CFG.HEAD_DICT).items()}
    for i, n_cls in enumerate(num_class_each_head):
        hd = dict(head_dict)
        hd["hm"] = {"out_channels": n_cls,
                    "num_conv": int(model_cfg.NUM_HM_CONV)}
        ht = tree.sub(f"heads_list.{i}")
        hp, hs = {}, {}
        for name, spec in hd.items():
            nc = int(spec["num_conv"])
            for k in range(nc - 1):
                st = ht.sub(f"{name}.{k}")
                lp = {"kernel": _conv2d_kernel(st.sub("0")["weight"])}
                if "0.bias" in st:
                    lp["bias"] = st.sub("0")["bias"]
                hp[f"{name}_conv{k}"] = lp
                bp, bs = {}, {}
                _bn(st.sub("1"), bp, bs)
                hp[f"{name}_bn{k}"] = bp["bn"]
                hs[f"{name}_bn{k}"] = bs["bn"]
            fin = ht.sub(f"{name}.{nc - 1}")
            hp[f"{name}_out"] = {"kernel": _conv2d_kernel(fin["weight"]),
                                 "bias": fin["bias"]}
        params[f"head_{i}"] = hp
        stats[f"head_{i}"] = hs
    return params, stats


def convert_centerpoint_checkpoint(state_dict, model_cfg, class_names):
    """CenterPoint: MeanVFE (no params) + VoxelResBackBone8x +
    BaseBEVBackbone + CenterHead."""
    tree = TorchTree(state_dict)
    params, stats = {}, {}
    p, s = convert_voxel_res_backbone_dense(tree.sub("backbone_3d"))
    params["backbone_3d"], stats["backbone_3d"] = p, s
    p, s = convert_bev_backbone(tree.sub("backbone_2d"),
                                model_cfg.BACKBONE_2D)
    params["backbone_2d"], stats["backbone_2d"] = p, s
    head_cfg = model_cfg.DENSE_HEAD
    n_each = [len([c for c in group if c in class_names])
              for group in head_cfg.CLASS_NAMES_EACH_HEAD]
    p, s = convert_center_head(tree.sub("dense_head"), head_cfg, n_each)
    params["dense_head"], stats["dense_head"] = p, s
    return {"params": params, "batch_stats": stats}


def convert_pointpillar_checkpoint(state_dict, model_cfg):
    """PointPillar: vfe + backbone_2d + dense_head (AnchorHeadSingle)."""
    tree = TorchTree(state_dict)
    params, stats = {}, {}
    p, s = convert_pillar_vfe(tree.sub("vfe"),
                              list(model_cfg.VFE.NUM_FILTERS))
    params["vfe"], stats["vfe"] = p, s
    p, s = convert_bev_backbone(tree.sub("backbone_2d"),
                                model_cfg.BACKBONE_2D)
    params["backbone_2d"], stats["backbone_2d"] = p, s
    params["dense_head"] = convert_anchor_head_single(tree.sub("dense_head"))
    return {"params": params, "batch_stats": stats}


def convert_second_checkpoint(state_dict, model_cfg):
    """SECOND (dense VoxelBackBone8x analogue): backbone_3d +
    backbone_2d + dense_head.  MeanVFE and HeightCompression have no
    parameters."""
    tree = TorchTree(state_dict)
    bb_cfg = model_cfg.BACKBONE_3D
    widths = list(bb_cfg.get("NUM_FILTERS", [16, 16, 32, 64, 64]))
    c_out = int(bb_cfg.get("NUM_OUTPUT_FEATURES", 128))
    params, stats = {}, {}
    p, s = convert_voxel_backbone_dense(tree.sub("backbone_3d"),
                                        widths, c_out, input_channels=4)
    params["backbone_3d"], stats["backbone_3d"] = p, s
    p, s = convert_bev_backbone(tree.sub("backbone_2d"),
                                model_cfg.BACKBONE_2D)
    params["backbone_2d"], stats["backbone_2d"] = p, s
    params["dense_head"] = convert_anchor_head_single(tree.sub("dense_head"))
    return {"params": params, "batch_stats": stats}


def convert_checkpoint_any(state_dict, model_cfg, num_class=3,
                           input_channels=4, class_names=None):
    """Dispatch by MODEL.NAME; falls back to the IASSD converter."""
    name = model_cfg.get("NAME", "IASSD")
    if name == "PointPillar":
        return convert_pointpillar_checkpoint(state_dict, model_cfg)
    if name in ("SECOND", "SECONDNet"):
        return convert_second_checkpoint(state_dict, model_cfg)
    if name == "CenterPoint":
        return convert_centerpoint_checkpoint(
            state_dict, model_cfg, class_names or [])
    return convert_checkpoint(
        state_dict, model_cfg, num_class=num_class,
        input_channels=input_channels,
    )


def convert_checkpoint(state_dict, model_cfg, num_class=3, input_channels=4):
    """state_dict: torch name -> numpy array. Returns flax variables dict."""
    sa_cfg = model_cfg.BACKBONE_3D.SA_CONFIG
    tree = TorchTree(state_dict)
    bb_params, bb_stats = {}, {}

    channel_in = input_channels - 3
    channel_out_list = [channel_in]
    for k in range(len(sa_cfg.NSAMPLE_LIST)):
        layer_input = sa_cfg.LAYER_INPUT[k]
        channel_in = channel_out_list[
            layer_input[-1] if isinstance(layer_input, list) else layer_input
        ]
        mod_tree = tree.sub(f"backbone_3d.SA_modules.{k}")
        if sa_cfg.LAYER_TYPE[k] == "SA_Layer":
            mlps = [[channel_in] + list(m) for m in sa_cfg.MLPS[k]]
            channel_out = sum(m[-1] for m in mlps) if mlps else 0
            # the reference only builds aggregation/confidence layers when
            # the SA layer has grouping MLPs (pointnet2_modules.py:1470-1487)
            agg = (
                list(sa_cfg.AGGREGATION_MLPS[k])
                if sa_cfg.AGGREGATION_MLPS[k] and sa_cfg.MLPS[k] else None
            )
            conf = (
                list(sa_cfg.CONFIDENCE_MLPS[k])
                if sa_cfg.CONFIDENCE_MLPS[k] and sa_cfg.MLPS[k] else None
            )
            if agg:
                channel_out = agg[-1]
            if k < 1 or k > 4:
                p, s = convert_sa_withsampling(mod_tree, mlps, agg, conf)
            else:
                p, s = convert_sa_ellipsoid(mod_tree, mlps, agg, conf)
        else:
            p, s = convert_vote_layer(mod_tree, list(sa_cfg.MLPS[k]))
            channel_out = channel_out_list[layer_input]
        bb_params[f"SA_modules_{k}"] = p
        bb_stats[f"SA_modules_{k}"] = s
        channel_out_list.append(channel_out)

    head_cfg = model_cfg.POINT_HEAD
    hp, hs = {}, {}
    p, s, out = convert_fc_head(tree.sub("point_head.cls_center_layers"),
                                list(head_cfg.CLS_FC))
    hp["cls_center_layers"], hs["cls_center_layers"], hp["cls_center_out"] = p, s, out
    p, s, out = convert_fc_head(tree.sub("point_head.box_center_layers"),
                                list(head_cfg.REG_FC))
    hp["box_center_layers"], hs["box_center_layers"], hp["box_center_out"] = p, s, out

    def drop_empty(d):
        return {
            k: drop_empty(v) if isinstance(v, dict) else v
            for k, v in d.items()
            if not (isinstance(v, dict) and not drop_empty(v))
        }

    return {
        "params": drop_empty({"backbone_3d": bb_params, "point_head": hp}),
        "batch_stats": drop_empty({"backbone_3d": bb_stats, "point_head": hs}),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True, help=".pth checkpoint")
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--output", required=True, help="output .pkl")
    args = parser.parse_args()

    import torch

    from pdanet_tpu.config import cfg_from_yaml_file
    from pdanet_tpu.utils.easydict import EasyDict

    cfg = cfg_from_yaml_file(args.cfg_file, EasyDict())
    ck = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ck.get("model_state", ck)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = convert_checkpoint_any(
        sd, cfg.MODEL, num_class=len(cfg.CLASS_NAMES), input_channels=4,
        class_names=list(cfg.CLASS_NAMES),
    )
    out = {
        "epoch": ck.get("epoch", 0),
        "it": ck.get("it", 0),
        "model_state": variables,
        "optimizer_state": None,
        "version": "converted+%s" % ck.get("version", "unknown"),
    }
    with open(args.output, "wb") as f:
        pickle.dump(out, f)
    print("wrote", args.output)


if __name__ == "__main__":
    main()
