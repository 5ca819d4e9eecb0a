"""Independent PyTorch transcriptions of the reference building blocks, used
ONLY as numeric oracles for the checkpoint converter and layer-semantics
tests. State-dict key layout matches the reference modules
(models/backbones/resnet.py, models/estimator/egoposeformer_heatmap.py,
models/utils/transformer.py) so `egorear_tpu.train.torch_convert` can be
exercised against realistic checkpoints without the reference's heavyweight
deps (torchvision/mmcv/timm are not installed here).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class Backbone(nn.Module):
    """torchvision-resnet18 split into stride stages (resnet.py:6-74)."""

    def __init__(self):
        super().__init__()
        self.layer_s2 = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64), nn.ReLU()
        )
        self.layer_s4 = nn.Sequential(
            nn.MaxPool2d(3, 2, 1),
            nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64)),
        )
        self.layer_s8 = nn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
        self.layer_s16 = nn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
        self.layer_s32 = nn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))

    def forward(self, x):
        s2 = self.layer_s2(x)
        s4 = self.layer_s4(s2)
        s8 = self.layer_s8(s4)
        s16 = self.layer_s16(s8)
        s32 = self.layer_s32(s16)
        return [s4, s8, s16, s32]


class Neck(nn.Module):
    """EfficientFPN (resnet.py:77-137)."""

    def __init__(self, in_channels=(64, 128, 256, 512), out_channels=128):
        super().__init__()
        self.updample = nn.Upsample(scale_factor=2, mode="bilinear",
                                    align_corners=True)
        self.lateral_convs = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(c, out_channels, 1), nn.ReLU())
             for c in in_channels]
        )
        self.fuse_convs = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(out_channels * 2, out_channels, 1), nn.ReLU())
             for _ in in_channels[1:]]
        )
        self.fpn_convs = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(out_channels, out_channels, 3, padding=1),
                           nn.ReLU())
             for _ in in_channels[1:]]
        )

    def forward(self, feats):
        laterals = [conv(f) for conv, f in zip(self.lateral_convs, feats)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = self.fpn_convs[i - 1](
                self.fuse_convs[i - 1](
                    torch.cat((laterals[i - 1], self.updample(laterals[i])), dim=1)
                )
            )
        return laterals[0]


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = Backbone()
        self.neck = Neck()

    def forward(self, x):
        feats = self.backbone(x)
        return self.neck(feats), feats


class HeatmapModel(nn.Module):
    """EgoPoseFormerHeatmap (egoposeformer_heatmap.py:9-44), single view."""

    def __init__(self, num_heatmap=15):
        super().__init__()
        self.encoder = Encoder()
        self.conv_heatmap = nn.Conv2d(128, num_heatmap, 1)

    def forward(self, x):  # (N, 3, H, W)
        feats, backbone_feats = self.encoder(x)
        return self.conv_heatmap(feats), feats, backbone_feats


class FFN(nn.Module):
    """transformer.py:8-33."""

    def __init__(self, embed_dims, feedforward_dims, num_fcs=2, ffn_drop=0.0):
        super().__init__()
        layers = []
        cin = embed_dims
        for _ in range(num_fcs - 1):
            layers.append(nn.Sequential(
                nn.Linear(cin, feedforward_dims), nn.GELU(), nn.Dropout(ffn_drop)
            ))
            cin = feedforward_dims
        layers.append(nn.Linear(feedforward_dims, embed_dims))
        layers.append(nn.Dropout(ffn_drop))
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class SpatialMHA(nn.Module):
    """CustomMultiheadAttention + SpatialMHA forward (transformer.py:36-108,
    egoposeformer_heatmap_mvf_ex.py:799-817)."""

    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dims = embed_dim // num_heads
        self.scale = self.head_dims ** -0.5
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.out_proj = nn.Linear(embed_dim, embed_dim)

    def forward(self, q, k, v):
        B, J, C = q.shape
        _q = self.q_proj(q).reshape(B, J, self.num_heads, self.head_dims).permute(0, 2, 1, 3)
        _k = self.k_proj(k).reshape(B, J, self.num_heads, self.head_dims).permute(0, 2, 1, 3)
        _v = self.v_proj(v).reshape(B, J, self.num_heads, self.head_dims).permute(0, 2, 1, 3)
        attn = (_q @ _k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ _v).permute(0, 2, 1, 3).reshape(B, J, C)
        return self.out_proj(x)


class DeformHeads(nn.Module):
    """The linear heads of MSDeformAttn (deform_attn.py:60-63) -- the
    sampling itself is tested against the naive oracle elsewhere."""

    def __init__(self, d_model=256, n_heads=4, n_points=16):
        super().__init__()
        self.sampling_offsets = nn.Linear(d_model, n_heads * n_points * 2)
        self.attention_weights = nn.Linear(d_model, n_heads * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)


# ---------------------------------------------------------------------------
# Full-cascade transcription (MVFex + Pose3D), state-dict keys matching the
# reference (egoposeformer_heatmap_mvf_ex.py / egoposeformer_mvf_ex.py), used
# for whole-model conversion parity and as the measurable torch baseline.
# ---------------------------------------------------------------------------


class MSDeformAttnTorch(nn.Module):
    """deform_attn.py:25-168 with the CUDA kernel replaced by grid_sample
    (same bilinear/zeros/align_corners=False semantics)."""

    def __init__(self, d_model, n_heads, n_points, H, W):
        super().__init__()
        self.nh, self.np_, self.H, self.W = n_heads, n_points, H, W
        self.sampling_offsets = nn.Linear(d_model, n_heads * n_points * 2)
        self.attention_weights = nn.Linear(d_model, n_heads * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, ref_pts, value_flat):
        B, Q, C = query.shape
        nh, P, H, W = self.nh, self.np_, self.H, self.W
        v = self.value_proj(value_flat).reshape(B, H * W, nh, C // nh)
        off = self.sampling_offsets(query).reshape(B, Q, nh, P, 2)
        w = self.attention_weights(query).reshape(B, Q, nh, P).softmax(-1)
        loc = ref_pts[:, :, None, None, :] + off / torch.tensor(
            [W, H], dtype=query.dtype)
        vmap = v.permute(0, 2, 3, 1).reshape(B * nh, C // nh, H, W)
        grid = (2.0 * loc - 1.0).permute(0, 2, 1, 3, 4).reshape(B * nh, Q, P, 2)
        samp = F.grid_sample(vmap, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=False)  # (B*nh, ch, Q, P)
        samp = samp.reshape(B, nh, C // nh, Q, P)
        out = (samp * w.permute(0, 2, 1, 3)[:, :, None]).sum(-1)
        out = out.permute(0, 3, 1, 2).reshape(B, Q, C)
        return self.output_proj(out)


class MVTLayerTorch(nn.Module):
    """MultiViewTransformerLayer (egoposeformer_heatmap_mvf_ex.py:820-935)."""

    def __init__(self, num_views, embed_dims, H, W, num_heads=4, ffn_dims=512):
        super().__init__()
        self.cross_attn = MSDeformAttnTorch(embed_dims, num_heads, 16, H, W)
        self.fuse_mlp = nn.Linear(num_views * embed_dims, embed_dims)
        self.norm_cross = nn.LayerNorm(embed_dims)
        self.spatial_attn = SpatialMHA(embed_dims, num_heads)
        self.norm_spatial = nn.LayerNorm(embed_dims)
        self.ffn = FFN(embed_dims, ffn_dims)
        self.norm_ffn = nn.LayerNorm(embed_dims)

    def forward(self, q, memory, anchors_2d, anchors_valid):
        B, V = memory.shape[:2]
        feats = []
        for i in range(V):
            r = self.cross_attn(q, anchors_2d[:, i], memory[:, i])
            r = r.masked_fill(~anchors_valid[:, i][..., None].expand_as(r), 0.0)
            feats.append(r)
        x = self.norm_cross(q + self.fuse_mlp(torch.cat(feats, dim=-1)))
        x = self.norm_spatial(x + self.spatial_attn(x, x, x))
        x = self.norm_ffn(x + self.ffn(x))
        return x


class HeatmapMVFTorch(nn.Module):
    """HeatmapMVF, JQA mode + 1x1 conv head
    (egoposeformer_heatmap_mvf_ex.py:442-731)."""

    def __init__(self, num_views=4, num_heatmap=15, input_dims=128,
                 embed_dims=256, num_layers=1, feat=64, detach_hm=True):
        super().__init__()
        self.J, self.V, self.feat = num_heatmap, num_views, feat
        self.detach_hm = detach_hm
        self.heatmap_proj = nn.Sequential(
            nn.Linear(feat * feat, embed_dims), nn.ReLU(),
            nn.Linear(embed_dims, embed_dims))
        self.fc_bfb = nn.Linear(512, embed_dims)
        self.fc_query = nn.Sequential(nn.Linear(embed_dims, embed_dims), nn.ReLU())
        self.joint_query_embed = nn.Embedding(num_heatmap, embed_dims)
        self.frame_feat_multi_view_proj = nn.Conv2d(input_dims, embed_dims, 1)
        self.frame_feat_multi_view_pos_embed = nn.Parameter(
            torch.zeros(1, num_views, feat * feat, embed_dims))
        self.frame_feat_proj_layers = nn.Sequential(
            nn.Conv2d(input_dims, input_dims * 2, 1), nn.ReLU(),
            nn.Conv2d(input_dims * 2, input_dims * 4, 3, 2, 1), nn.ReLU(),
            nn.Conv2d(input_dims * 4, input_dims, 1), nn.ReLU())
        self.transformer_layers = nn.ModuleList(
            [MVTLayerTorch(num_views, embed_dims, feat, feat)
             for _ in range(num_layers)])
        self.post_norm = nn.ModuleList(
            [nn.LayerNorm(embed_dims) for _ in range(num_layers)])
        self.head_layers = nn.ModuleList()
        for _ in range(num_layers):
            head = nn.Sequential(
                nn.Conv2d(num_heatmap, input_dims // 2, 1), nn.ReLU(),
                nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
                nn.Conv2d(input_dims // 2, input_dims, 1), nn.ReLU())
            wrapper = nn.Module()
            wrapper.head = head
            self.head_layers.append(wrapper)
        self.frame_feat_refined_proj_layers = nn.ModuleList([
            nn.Sequential(nn.Conv2d(input_dims, input_dims, 1), nn.ReLU(),
                          nn.Upsample(scale_factor=2, mode="bilinear",
                                      align_corners=True),
                          nn.Conv2d(input_dims, input_dims, 1), nn.ReLU())
            for _ in range(num_layers)])
        self.conv_heatmap = nn.Conv2d(input_dims, num_heatmap, 1)

    def forward(self, heatmap, frame_feat, frame_feat_mv, anchors_2d,
                anchors_valid, bfb, bfb_mv):
        import math
        B, V, C, H, W = frame_feat_mv.shape
        hm = heatmap.reshape(B, self.J, -1)
        hm_embed = self.heatmap_proj(hm)
        pooled = F.adaptive_avg_pool2d(bfb, (1, 1)).reshape(B, -1)
        bfb_e = self.fc_bfb(pooled).unsqueeze(1)
        jq = self.joint_query_embed.weight.unsqueeze(0).repeat(B, 1, 1)
        x = self.fc_query(jq + bfb_e + hm_embed)

        mv = self.frame_feat_multi_view_proj(
            frame_feat_mv.reshape(B * V, C, H, W))
        mv = mv.reshape(B, V, -1, H * W).permute(0, 1, 3, 2)
        mv = mv + self.frame_feat_multi_view_pos_embed

        f = self.frame_feat_proj_layers(frame_feat)

        hms, feats = [], []
        for i, layer in enumerate(self.transformer_layers):
            x = layer(x, mv, anchors_2d, anchors_valid)
            _x = self.post_norm[i](x)
            side = int(math.sqrt(_x.shape[-1]))
            maps = _x.reshape(B, self.J, side, side)
            off = self.head_layers[i].head(maps)
            refined = self.frame_feat_refined_proj_layers[i](off + f.detach())
            feats.append(refined)
            hm_in = refined.detach() if self.detach_hm else refined
            hms.append(self.conv_heatmap(hm_in))
        return hms, feats


class MVFEXTorch(nn.Module):
    """EgoPoseFormerHeatmapMVFEX, 4-view JQA + 1x1 conv
    (egoposeformer_heatmap_mvf_ex.py:27-437)."""

    def __init__(self, num_heatmap=15, threshold=0.5, feat=64):
        super().__init__()
        self.J, self.th, self.feat = num_heatmap, threshold, feat
        self.heatmap_estimator_stereo_front = HeatmapModel(num_heatmap)
        self.heatmap_estimator_stereo_back = HeatmapModel(num_heatmap)
        names = ["front_left", "front_right", "back_left", "back_right"]
        for n in names:
            setattr(self, f"heatmap_refiner_{n}",
                    HeatmapMVFTorch(feat=feat))

    def _estimate(self, img):  # img (B, V, 3, H, W)
        B, V = img.shape[:2]
        outs = []
        for est, sl in ((self.heatmap_estimator_stereo_front, slice(0, 2)),
                        (self.heatmap_estimator_stereo_back, slice(2, 4))):
            x = img[:, sl].reshape(B * 2, *img.shape[2:])
            hm, feat, pyr = est(x)
            outs.append((hm.reshape(B, 2, *hm.shape[1:]),
                         feat.reshape(B, 2, *feat.shape[1:]),
                         [p.reshape(B, 2, *p.shape[1:]) for p in pyr]))
        hm = torch.cat([o[0] for o in outs], 1)
        feat = torch.cat([o[1] for o in outs], 1)
        pyr = [torch.cat([a, b], 1) for a, b in zip(outs[0][2], outs[1][2])]
        return hm, feat, pyr

    @staticmethod
    def _anchors(hm, th):
        B, V, J, H, W = hm.shape
        flat = hm.reshape(B, V, J, -1)
        maxv, idx = flat.max(dim=-1)
        x = (idx % W).float() / W
        y = torch.div(idx, W, rounding_mode="floor").float() / H
        pts = torch.stack([x, y], -1)
        return pts, maxv >= th

    def forward(self, img):
        with torch.no_grad():
            hm_init, feat, pyr = self._estimate(img)
        bfb = pyr[-1]
        anchors, valid = self._anchors(hm_init, self.th)
        hms_all = [hm_init]
        feats_all = [feat]
        per_layer_hms, per_layer_feats = [], []
        names = ["front_left", "front_right", "back_left", "back_right"]
        for v, n in enumerate(names):
            ref = getattr(self, f"heatmap_refiner_{n}")
            hms, feats = ref(hm_init[:, v], feat[:, v], feat, anchors, valid,
                             bfb[:, v], bfb)
            per_layer_hms.append(hms)
            per_layer_feats.append(feats)
        n_layers = len(per_layer_hms[0])
        for i in range(n_layers):
            hms_all.append(torch.stack([per_layer_hms[v][i] for v in range(4)], 1))
            feats_all.append(torch.stack([per_layer_feats[v][i] for v in range(4)], 1))
        return hms_all, feats_all


class FishEyeCameraTorch:
    """utils/camera_models.py:14-104 (syn mode), including the in-place
    offset/flip mutation of the shared anchor tensor (:57-63)."""

    def __init__(self, calib, name):
        self.calib = calib
        self.name = name
        offsets = {
            "camera_front_left": [6.0, 0.0, 0.0],
            "camera_front_right": [-6.0, 0.0, 0.0],
            "camera_back_left": [-6.0, 37.0, 0.0],
            "camera_back_right": [6.0, 37.0, 0.0],
        }
        self.offset = torch.tensor(offsets[name])
        self.flip = name in ("camera_back_left", "camera_back_right")

    def world2camera(self, pts3d):
        with torch.no_grad():
            if self.flip:
                pts3d[..., 0:2] *= -1
            pts3d += self.offset
            p = pts3d[:, None]
            x, y, z = p[..., 0], p[..., 1], p[..., 2]
            norm = torch.sqrt(x * x + y * y)
            theta = torch.atan(-z / norm)
            rho = sum(a * theta**i
                      for i, a in enumerate(self.calib["poly_world2cam"]))
            u = x / norm * rho + self.calib["center_xy"][0]
            v = y / norm * rho + self.calib["center_xy"][1]
            u = u / self.calib["image_size_hw"][1]
            v = v / self.calib["image_size_hw"][0]
            pt = torch.stack((u, v), dim=-1)
            fov = ((pt[..., 0] > 0) & (pt[..., 1] > 0)
                   & (pt[..., 0] < 1) & (pt[..., 1] < 1))
            return pt.clamp(0.0, 1.0), fov


class Pose3DTorch(nn.Module):
    """EgoPoseFormerPose3D, default conv-downsample proposal head
    (egoposeformer_mvf_ex.py:62-452)."""

    def __init__(self, calibs, num_views=4, num_joints=16, input_dims=128,
                 embed_dims=128, num_layers=3, feat=64):
        super().__init__()
        self.J, self.V, self.feat = num_joints, num_views, feat
        self.cameras = [
            FishEyeCameraTorch(calibs[n], n)
            for n in ("camera_front_left", "camera_front_right",
                      "camera_back_left", "camera_back_right")[:num_views]
        ]
        self.feat_proj = nn.Conv2d(input_dims, embed_dims, 1)
        self.layers = nn.ModuleList(
            [MVTLayerTorch(num_views, embed_dims, feat, feat)
             for _ in range(num_layers)])
        self.query_gen_mlp = nn.Sequential(
            nn.Linear(4, embed_dims), nn.ReLU(),
            nn.Linear(embed_dims, embed_dims), nn.ReLU(),
            nn.Linear(embed_dims, embed_dims))
        self.conv_frame_feat = nn.Sequential(
            nn.Conv2d(input_dims, input_dims // 2, 1), nn.ReLU(),
            nn.Conv2d(input_dims // 2, input_dims, 3, 2, 1), nn.ReLU(),
            nn.MaxPool2d(2),
            nn.Conv2d(input_dims, input_dims // 2, 1), nn.ReLU(),
            nn.Conv2d(input_dims // 2, input_dims, 3, 2, 1), nn.ReLU())
        mlp = []
        in_dims = num_views * 128 * (feat // 8) * (feat // 8)
        for _ in range(2):
            mlp.append(nn.Sequential(nn.Linear(in_dims, in_dims // 16),
                                     nn.GELU(), nn.Dropout(0.0)))
            in_dims //= 16
        mlp.append(nn.Linear(in_dims, 3 * num_joints))
        self.mlp_pred = nn.Sequential(*mlp)
        self.reg_mlp = nn.ModuleList()
        for _ in range(num_layers):
            self.reg_mlp.append(nn.Sequential(
                nn.Linear(embed_dims, embed_dims), nn.GELU(),
                nn.Linear(embed_dims, 3)))
        self.post_norm = nn.ModuleList(
            [nn.LayerNorm(embed_dims) for _ in range(num_layers)])

    def forward(self, feats_init, feats_final, heatmap):
        B, V, C, H, W = feats_final.shape
        # use_pred_heatmap_init=True -> transformer memory from init feats.
        ff = self.feat_proj(feats_init.reshape(B * V, C, H, W))
        memory = ff.reshape(B, V, -1, H * W).permute(0, 1, 3, 2)

        y = self.conv_frame_feat(feats_final.reshape(B * V, C, H, W))
        mlp_pred = self.mlp_pred(y.reshape(B, -1)).reshape(B, self.J, 3)

        anchors = mlp_pred.clone().detach()
        pts, fovs = [], []
        for cam in self.cameras:  # NOTE: mutates `anchors` in place
            pt, fov = cam.world2camera(anchors)
            pts.append(pt)
            fovs.append(fov)
        anchors_2d = torch.cat(pts, dim=1)
        anchors_valid = torch.cat(fovs, dim=1)

        joint_inds = (torch.arange(1, self.J + 1, dtype=memory.dtype)
                      .reshape(1, self.J, 1).repeat(B, 1, 1)) / float(self.J)
        x = self.query_gen_mlp(torch.cat((joint_inds, anchors), dim=-1))

        preds = [mlp_pred]
        for i, layer in enumerate(self.layers):
            x = layer(x, memory, anchors_2d, anchors_valid)
            _x = self.post_norm[i](x)
            off = self.reg_mlp[i](_x)
            preds.append(off + anchors.detach())
        return preds


class EgoRearTorch(nn.Module):
    """EgoPoseFormerMVFEX full cascade (egoposeformer_mvf_ex.py:22-59)."""

    def __init__(self, calibs, feat=64):
        super().__init__()
        self.heatmap_estimator = MVFEXTorch(feat=feat)
        self.pose3d_estimator = Pose3DTorch(calibs, feat=feat)

    def forward(self, img):
        hms, feats = self.heatmap_estimator(img)
        preds = self.pose3d_estimator(feats[0], feats[-1], hms[-1])
        return preds, hms
