"""Torch DISK oracle: original thin U-Net architecture with
kornia-style module paths (unet.path_down.{i} / unet.path_up.{i}).

kornia is unavailable offline; this replica follows the original DISK
repository's `unets` building blocks (pre-activation 5x5 conv blocks,
trivial avg-pool down / nearest up), used purely as a numerical oracle
— and its state dict exercises models.convert.disk_params_from_torch.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TrivialDownsample(nn.Module):
    def forward(self, x):
        return F.avg_pool2d(x, 2)


class TrivialUpsample(nn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="nearest")


class Conv(nn.Sequential):
    """Pre-activation conv block: InstanceNorm -> PReLU -> Conv(bias)."""

    def __init__(self, in_, out_, size=5, is_first=False):
        if is_first:
            modules = [nn.Conv2d(in_, out_, size, padding=size // 2)]
        else:
            modules = [nn.InstanceNorm2d(in_),
                       nn.PReLU(in_),
                       nn.Conv2d(in_, out_, size, padding=size // 2)]
        super().__init__(*modules)


class ThinUnetDownBlock(nn.Sequential):
    def __init__(self, in_, out_, size=5, is_first=False):
        if is_first:
            super().__init__(nn.Identity(),
                             Conv(in_, out_, size, is_first=True))
        else:
            super().__init__(TrivialDownsample(), Conv(in_, out_, size))


class ThinUnetUpBlock(nn.Module):
    def __init__(self, bottom_, horizontal_, out_, size=5):
        super().__init__()
        self.upsample = TrivialUpsample()
        self.conv = Conv(bottom_ + horizontal_, out_, size)

    def forward(self, bot, hor):
        buf = self.upsample(bot)
        return self.conv(torch.cat([buf, hor], dim=1))


class Unet(nn.Module):
    def __init__(self, in_features=3, size=5,
                 down=(16, 32, 64, 64, 64), up=(64, 64, 64, 129)):
        super().__init__()
        self.path_down = nn.ModuleList()
        prev = in_features
        for i, d in enumerate(down):
            self.path_down.append(
                ThinUnetDownBlock(prev, d, size, is_first=(i == 0)))
            prev = d
        self.path_up = nn.ModuleList()
        bot = down[-1]
        for skip, u in zip(down[-2::-1], up):
            self.path_up.append(ThinUnetUpBlock(bot, skip, u, size))
            bot = u

    def forward(self, x):
        feats = [x]
        for block in self.path_down:
            feats.append(block(feats[-1]))
        bot = feats[-1]
        horizontals = feats[-2:0:-1]
        for block, hor in zip(self.path_up, horizontals):
            bot = block(bot, hor)
        return bot


class DISK(nn.Module):
    """kornia.feature.DISK equivalent: unet + heatmap/descriptor split."""

    def __init__(self, desc_dim=128):
        super().__init__()
        self.desc_dim = desc_dim
        self.unet = Unet(in_features=3, size=5,
                         down=(16, 32, 64, 64, 64),
                         up=(64, 64, 64, desc_dim + 1))

    @torch.no_grad()
    def heatmap_and_dense_descriptors(self, images):
        out = self.unet(images)
        return out[:, self.desc_dim:], out[:, : self.desc_dim]

    @torch.no_grad()
    def detect(self, images, window_size=5, score_threshold=0.0, n=None):
        """Local-max NMS + threshold + top-n (kornia heatmap_to_keypoints
        semantics). Returns per-image (kpts (N,2) xy, scores, desc)."""
        heat, desc = self.heatmap_and_dense_descriptors(images)
        results = []
        for b in range(images.shape[0]):
            h = heat[b, 0]
            local_max = F.max_pool2d(
                h[None, None], window_size, stride=1,
                padding=window_size // 2)[0, 0]
            keep = (h == local_max) & (h > score_threshold)
            ys, xs = torch.nonzero(keep, as_tuple=True)
            scores = h[ys, xs]
            if n is not None and len(scores) > n:
                top = torch.topk(scores, n).indices
                ys, xs, scores = ys[top], xs[top], scores[top]
            d = desc[b, :, ys, xs].T
            d = F.normalize(d, dim=-1)
            results.append((torch.stack([xs, ys], -1).float(), scores, d))
        return results
