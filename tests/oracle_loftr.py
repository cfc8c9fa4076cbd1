"""Torch LoFTR oracle with kornia's exact module layout.

kornia (and the reference, via ``KF.LoFTR`` —
ref src/icepy4d/matching/matchers.py:1012) is unavailable offline, so
this is an independent torch re-implementation of the published LoFTR
architecture (Sun et al., CVPR 2021; kornia/feature/loftr) used purely
as a numerical oracle for tests. State-dict key names follow kornia
exactly, so ``models.convert.loftr_params_from_torch`` is exercised on
the real checkpoint layout.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv1x1(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, 1, stride=stride, bias=False)


def conv3x3(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, 3, stride=stride, padding=1,
                     bias=False)


class BasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = conv3x3(in_planes, planes, stride)
        self.conv2 = conv3x3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                conv1x1(in_planes, planes, stride=stride),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    def __init__(self, initial_dim=128, block_dims=(128, 196, 256)):
        super().__init__()
        self.in_planes = initial_dim
        self.conv1 = nn.Conv2d(1, initial_dim, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(initial_dim)
        self.relu = nn.ReLU(inplace=True)
        self.layer1 = self._make_layer(block_dims[0], 1)
        self.layer2 = self._make_layer(block_dims[1], 2)
        self.layer3 = self._make_layer(block_dims[2], 2)
        self.layer3_outconv = conv1x1(block_dims[2], block_dims[2])
        self.layer2_outconv = conv1x1(block_dims[1], block_dims[2])
        self.layer2_outconv2 = nn.Sequential(
            conv3x3(block_dims[2], block_dims[2]),
            nn.BatchNorm2d(block_dims[2]),
            nn.LeakyReLU(),
            conv3x3(block_dims[2], block_dims[1]))
        self.layer1_outconv = conv1x1(block_dims[0], block_dims[1])
        self.layer1_outconv2 = nn.Sequential(
            conv3x3(block_dims[1], block_dims[1]),
            nn.BatchNorm2d(block_dims[1]),
            nn.LeakyReLU(),
            conv3x3(block_dims[1], block_dims[0]))

    def _make_layer(self, dim, stride):
        layers = (BasicBlock(self.in_planes, dim, stride),
                  BasicBlock(dim, dim, 1))
        self.in_planes = dim
        return nn.Sequential(*layers)

    def forward(self, x):
        x0 = self.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_out_2x = F.interpolate(x3_out, scale_factor=2.0, mode="bilinear",
                                  align_corners=True)
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_out_2x)
        x2_out_2x = F.interpolate(x2_out, scale_factor=2.0, mode="bilinear",
                                  align_corners=True)
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_out_2x)
        return x3_out, x1_out


class PositionEncodingSine(nn.Module):
    def __init__(self, d_model, max_shape=(256, 256), temp_bug_fix=False):
        super().__init__()
        pe = torch.zeros((d_model, *max_shape))
        y_position = torch.ones(max_shape).cumsum(0).float().unsqueeze(0)
        x_position = torch.ones(max_shape).cumsum(1).float().unsqueeze(0)
        if temp_bug_fix:
            div_term = torch.exp(
                torch.arange(0, d_model // 2, 2).float()
                * (-math.log(10000.0) / (d_model // 2)))
        else:
            div_term = torch.exp(
                torch.arange(0, d_model // 2, 2).float()
                * (-math.log(10000.0) / d_model // 2))
        div_term = div_term[:, None, None]
        pe[0::4, :, :] = torch.sin(x_position * div_term)
        pe[1::4, :, :] = torch.cos(x_position * div_term)
        pe[2::4, :, :] = torch.sin(y_position * div_term)
        pe[3::4, :, :] = torch.cos(y_position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0), persistent=False)

    def forward(self, x):
        return x + self.pe[:, :, : x.size(2), : x.size(3)]


class LinearAttention(nn.Module):
    def __init__(self, eps=1e-6):
        super().__init__()
        self.eps = eps

    def forward(self, queries, keys, values, q_mask=None, kv_mask=None):
        Q = F.elu(queries) + 1.0
        K = F.elu(keys) + 1.0
        if q_mask is not None:
            Q = Q * q_mask[:, :, None, None]
        if kv_mask is not None:
            K = K * kv_mask[:, :, None, None]
            values = values * kv_mask[:, :, None, None]
        v_length = values.size(1)
        values = values / v_length
        KV = torch.einsum("nshd,nshv->nhdv", K, values)
        Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + self.eps)
        out = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
        return out.contiguous()


class LoFTREncoderLayer(nn.Module):
    def __init__(self, d_model, nhead):
        super().__init__()
        self.dim = d_model // nhead
        self.nhead = nhead
        self.q_proj = nn.Linear(d_model, d_model, bias=False)
        self.k_proj = nn.Linear(d_model, d_model, bias=False)
        self.v_proj = nn.Linear(d_model, d_model, bias=False)
        self.attention = LinearAttention()
        self.merge = nn.Linear(d_model, d_model, bias=False)
        self.mlp = nn.Sequential(
            nn.Linear(d_model * 2, d_model * 2, bias=False),
            nn.ReLU(True),
            nn.Linear(d_model * 2, d_model, bias=False))
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, x, source, x_mask=None, source_mask=None):
        bs = x.size(0)
        query = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        key = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        value = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        message = self.attention(query, key, value, q_mask=x_mask,
                                 kv_mask=source_mask)
        message = self.merge(message.view(bs, -1, self.nhead * self.dim))
        message = self.norm1(message)
        message = self.mlp(torch.cat([x, message], dim=2))
        message = self.norm2(message)
        return x + message


class LocalFeatureTransformer(nn.Module):
    def __init__(self, d_model, nhead, layer_names):
        super().__init__()
        self.layer_names = list(layer_names)
        self.layers = nn.ModuleList(
            [LoFTREncoderLayer(d_model, nhead) for _ in self.layer_names])

    def forward(self, feat0, feat1, mask0=None, mask1=None):
        # official ordering: cross updates are sequential — feat1
        # attends to the already-updated feat0
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            else:
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
        return feat0, feat1


class CoarseMatching(nn.Module):
    def __init__(self, thr=0.2, border_rm=2, temperature=0.1):
        super().__init__()
        self.thr = thr
        self.border_rm = border_rm
        self.temperature = temperature

    def forward(self, feat_c0, feat_c1, data):
        feat_c0 = feat_c0 / feat_c0.shape[-1] ** 0.5
        feat_c1 = feat_c1 / feat_c1.shape[-1] ** 0.5
        sim = torch.einsum("nlc,nsc->nls", feat_c0,
                           feat_c1) / self.temperature
        conf = F.softmax(sim, 1) * F.softmax(sim, 2)

        mask = conf > self.thr
        h0c, w0c = data["hw0_c"]
        h1c, w1c = data["hw1_c"]
        b = conf.shape[0]
        m = mask.view(b, h0c, w0c, h1c, w1c)
        rm = self.border_rm
        m[:, :rm] = False
        m[:, -rm:] = False
        m[:, :, :rm] = False
        m[:, :, -rm:] = False
        m[:, :, :, :rm] = False
        m[:, :, :, -rm:] = False
        m[..., :rm] = False
        m[..., -rm:] = False
        mask = m.view(b, h0c * w0c, h1c * w1c)

        mask = (mask
                * (conf == conf.max(dim=2, keepdim=True)[0])
                * (conf == conf.max(dim=1, keepdim=True)[0]))
        b_ids, i_ids, j_ids = torch.nonzero(mask, as_tuple=True)
        mconf = conf[b_ids, i_ids, j_ids]
        scale = data["hw0_i"][0] // h0c
        mkpts0 = torch.stack([i_ids % w0c, i_ids // w0c], 1) * scale
        mkpts1 = torch.stack([j_ids % w1c, j_ids // w1c], 1) * scale
        return {"b_ids": b_ids, "i_ids": i_ids, "j_ids": j_ids,
                "mconf": mconf,
                "mkpts0_c": mkpts0.float(), "mkpts1_c": mkpts1.float()}


class FinePreprocess(nn.Module):
    def __init__(self, d_model_c=256, d_model_f=128, window=5):
        super().__init__()
        self.W = window
        self.down_proj = nn.Linear(d_model_c, d_model_f, bias=True)
        self.merge_feat = nn.Linear(2 * d_model_f, d_model_f, bias=True)

    def forward(self, feat_f0, feat_f1, feat_c0, feat_c1, data, cm):
        W = self.W
        stride = data["hw0_f"][0] // data["hw0_c"][0]
        n = cm["b_ids"].shape[0]
        if n == 0:
            c = feat_f0.shape[1]
            e = torch.empty(0, W * W, c)
            return e, e

        def unfold(f):
            out = F.unfold(f, kernel_size=(W, W), stride=stride,
                           padding=W // 2)
            c = f.shape[1]
            out = out.transpose(1, 2).reshape(f.shape[0], -1, c, W * W)
            return out.permute(0, 1, 3, 2)  # (N, L, WW, C)

        f0 = unfold(feat_f0)[cm["b_ids"], cm["i_ids"]]
        f1 = unfold(feat_f1)[cm["b_ids"], cm["j_ids"]]
        c0 = feat_c0[cm["b_ids"], cm["i_ids"]]
        c1 = feat_c1[cm["b_ids"], cm["j_ids"]]
        cwin = self.down_proj(torch.cat([c0, c1], 0))  # (2n, Cf)
        merged = self.merge_feat(torch.cat([
            torch.cat([f0, f1], 0),
            cwin.unsqueeze(1).repeat(1, W * W, 1)], -1))
        return merged[:n], merged[n:]


class FineMatching(nn.Module):
    def forward(self, feat_f0, feat_f1, cm, scale):
        M, WW, C = feat_f0.shape
        W = int(WW ** 0.5)
        if M == 0:
            return cm["mkpts0_c"], cm["mkpts1_c"]
        picked = feat_f0[:, WW // 2, :]
        sim = torch.einsum("mc,mrc->mr", picked, feat_f1)
        heat = torch.softmax(sim / C ** 0.5, dim=1).view(-1, W, W)
        g = torch.linspace(-1.0, 1.0, W)
        gy, gx = torch.meshgrid(g, g, indexing="ij")
        grid = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        coords = heat.view(M, WW) @ grid
        mkpts1 = cm["mkpts1_c"] + coords * (W // 2) * scale
        return cm["mkpts0_c"], mkpts1


class LoFTR(nn.Module):
    """Assembled oracle, kornia attribute names (backbone, pos_encoding,
    loftr_coarse, fine_preprocess, loftr_fine)."""

    def __init__(self, temp_bug_fix=False, thr=0.2):
        super().__init__()
        self.backbone = ResNetFPN_8_2()
        self.pos_encoding = PositionEncodingSine(256,
                                                 temp_bug_fix=temp_bug_fix)
        self.loftr_coarse = LocalFeatureTransformer(
            256, 8, ["self", "cross"] * 4)
        self.coarse_matching = CoarseMatching(thr=thr)
        self.fine_preprocess = FinePreprocess()
        self.loftr_fine = LocalFeatureTransformer(128, 8, ["self", "cross"])
        self.fine_matching = FineMatching()

    @torch.no_grad()
    def forward(self, img0, img1):
        """img0/img1: (1, 1, H, W) float in [0, 1], H/W divisible by 8."""
        data = {
            "hw0_i": img0.shape[2:], "hw1_i": img1.shape[2:],
        }
        feats_c, feats_f = self.backbone(torch.cat([img0, img1], 0))
        feat_c0, feat_c1 = feats_c.split(1)
        feat_f0, feat_f1 = feats_f.split(1)
        data["hw0_c"] = feat_c0.shape[2:]
        data["hw1_c"] = feat_c1.shape[2:]
        data["hw0_f"] = feat_f0.shape[2:]

        def flatten(f):
            return self.pos_encoding(f).flatten(2).transpose(1, 2)

        c0, c1 = self.loftr_coarse(flatten(feat_c0), flatten(feat_c1))
        cm = self.coarse_matching(c0, c1, data)
        f0, f1 = self.fine_preprocess(feat_f0, feat_f1, c0, c1, data, cm)
        if f0.shape[0] != 0:
            f0, f1 = self.loftr_fine(f0, f1)
        scale = data["hw0_i"][0] // data["hw0_f"][0]
        mkpts0, mkpts1 = self.fine_matching(f0, f1, cm, scale)
        return {"keypoints0": mkpts0, "keypoints1": mkpts1,
                "confidence": cm["mconf"],
                "i_ids": cm["i_ids"], "j_ids": cm["j_ids"]}
