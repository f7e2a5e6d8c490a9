"""Independent torch replica of the CoTracker w8 architecture.

Serves as the numerical oracle for the JAX port (`tracking/cotracker_net.py`)
exactly as `torch_raft_replica.py` does for RAFT: the same published
architecture (CoTracker v1: PIPs-style conv encoder, pyramid correlation
patches, factorized time/track attention, iterative window refinement),
written in idiomatic torch with the module tree the converter documents.
Parity between the two implementations validates the cross-framework port
(layouts, paddings, norm semantics, sampling conventions); loading a real
`cotracker_w8.pth` is then a key-mapping exercise
(`convert_cotracker_state_dict`).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


class ResidualBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.norm1 = nn.InstanceNorm2d(cout)
        self.norm2 = nn.InstanceNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride), nn.InstanceNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, output_dim=128, stride=4):
        super().__init__()
        self.stride = stride
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = nn.InstanceNorm2d(64)
        planes = (64, 96, 128, 128)
        cin = 64
        layers = []
        for i, p in enumerate(planes):
            s = 1 if i == 0 else 2
            layers.append(
                nn.Sequential(ResidualBlock(cin, p, s), ResidualBlock(p, p, 1))
            )
            cin = p
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.conv2 = nn.Conv2d(sum(planes), 2 * output_dim, 3, padding=1)
        self.norm2 = nn.InstanceNorm2d(2 * output_dim)
        self.conv3 = nn.Conv2d(2 * output_dim, output_dim, 1)

    def forward(self, x):
        _, _, h, w = x.shape
        target = (h // self.stride, w // self.stride)
        x = F.relu(self.norm1(self.conv1(x)))
        a = self.layer1(x)
        b = self.layer2(a)
        c = self.layer3(b)
        d = self.layer4(c)
        taps = [
            F.interpolate(t, target, mode="bilinear", align_corners=True)
            for t in (a, b, c, d)
        ]
        x = self.conv2(torch.cat(taps, dim=1))
        x = F.relu(self.norm2(x))
        return self.conv3(x)


class Attention(nn.Module):
    def __init__(self, hidden, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(hidden, 3 * hidden)
        self.proj = nn.Linear(hidden, hidden)

    def forward(self, x):
        b, t, d = x.shape
        dh = d // self.num_heads
        qkv = self.qkv(x).reshape(b, t, 3, self.num_heads, dh)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        attn = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(dh), dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(y)


class Mlp(nn.Module):
    def __init__(self, hidden, ratio=4.0):
        super().__init__()
        self.fc1 = nn.Linear(hidden, int(hidden * ratio))
        self.fc2 = nn.Linear(int(hidden * ratio), hidden)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x), approximate="tanh"))


class AttnBlock(nn.Module):
    def __init__(self, hidden, num_heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.norm2 = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.attn = Attention(hidden, num_heads)
        self.mlp = Mlp(hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class UpdateFormer(nn.Module):
    def __init__(
        self, input_dim, hidden, num_heads, output_dim, time_depth, space_depth
    ):
        super().__init__()
        self.num_heads = num_heads
        self.input_transform = nn.Linear(input_dim, hidden)
        self.flow_head = nn.Linear(hidden, output_dim)
        self.time_blocks = nn.ModuleList(
            AttnBlock(hidden, num_heads) for _ in range(time_depth)
        )
        self.space_blocks = nn.ModuleList(
            AttnBlock(hidden, num_heads) for _ in range(space_depth)
        )

    def forward(self, x):
        """(n_tracks, s, input_dim) -> (n_tracks, s, output_dim)."""
        x = self.input_transform(x)
        every = max(len(self.time_blocks) // max(len(self.space_blocks), 1), 1)
        j = 0
        for i, tb in enumerate(self.time_blocks):
            x = tb(x)
            if len(self.space_blocks) and i % every == 0 and j < len(
                self.space_blocks
            ):
                x = self.space_blocks[j](x.transpose(0, 1)).transpose(0, 1)
                j += 1
        return self.flow_head(x)


def get_2d_embedding(xy, channels):
    freq = (
        torch.arange(0, channels, 2, dtype=torch.float32) * (1000.0 / channels)
    )
    x = xy[..., 0:1] * freq
    y = xy[..., 1:2] * freq
    pe_x = torch.stack([torch.sin(x), torch.cos(x)], dim=-1).reshape(
        *xy.shape[:-1], channels
    )
    pe_y = torch.stack([torch.sin(y), torch.cos(y)], dim=-1).reshape(
        *xy.shape[:-1], channels
    )
    return torch.cat([xy, pe_x, pe_y], dim=-1)


class CoTrackerReplica(nn.Module):
    def __init__(
        self,
        window_len=8,
        stride=4,
        latent_dim=128,
        corr_levels=4,
        corr_radius=3,
        hidden_size=384,
        num_heads=8,
        time_depth=6,
        space_depth=6,
        iters=4,
        flow_emb_dim=64,
    ):
        super().__init__()
        self.S = window_len
        self.stride = stride
        self.latent_dim = latent_dim
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.flow_emb_dim = flow_emb_dim
        token_dim = (
            2 * flow_emb_dim
            + 2
            + corr_levels * (2 * corr_radius + 1) ** 2
            + latent_dim
        )
        self.fnet = BasicEncoder(latent_dim, stride)
        self.updateformer = UpdateFormer(
            token_dim, hidden_size, num_heads, latent_dim + 2, time_depth,
            space_depth,
        )
        self.norm = nn.GroupNorm(1, latent_dim)
        self.ffeat_updater = nn.Sequential(
            nn.Linear(latent_dim, latent_dim), nn.GELU()
        )
        self.vis_predictor = nn.Sequential(nn.Linear(latent_dim, 1))

    # -- sampling helpers (align_corners=False grid_sample conventions,
    # matching ops/grid_sample.py) ------------------------------------------

    @staticmethod
    def _sample(fmap, xy_pix):
        """fmap (s, c, h, w); xy_pix (s, n, 2) pixel coords; zeros padding."""
        s, c, h, w = fmap.shape
        grid = (xy_pix + 0.5) / torch.tensor([w, h], dtype=torch.float32)
        grid = grid * 2 - 1
        out = F.grid_sample(
            fmap,
            grid[:, :, None],
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )
        return out[..., 0]  # (s, c, n)

    def _corrs(self, pyramid, coords, ffeats):
        r = self.corr_radius
        k = 2 * r + 1
        dx, dy = torch.meshgrid(
            torch.arange(-r, r + 1, dtype=torch.float32),
            torch.arange(-r, r + 1, dtype=torch.float32),
            indexing="xy",
        )
        d = torch.stack([dx, dy], dim=-1).reshape(k * k, 2)
        outs = []
        for level, fmap in enumerate(pyramid):
            s, n, _ = coords.shape
            pts = coords / (2.0**level)
            pts = pts[:, :, None] + d[None, None]
            sampled = self._sample(fmap, pts.reshape(s, n * k * k, 2))
            patches = sampled.reshape(s, -1, n, k * k)
            corr = torch.einsum("snc,scnk->snk", ffeats, patches)
            outs.append(corr / math.sqrt(ffeats.shape[-1]))
        return torch.cat(outs, dim=-1)

    def window_forward(self, fmaps, coords, ffeats):
        pyramid = [fmaps]
        for _ in range(self.corr_levels - 1):
            pyramid.append(F.avg_pool2d(pyramid[-1], 2, stride=2))
        for _ in range(self.iters):
            corrs = self._corrs(pyramid, coords, ffeats)
            disp = coords - coords[0:1]
            emb = get_2d_embedding(disp, self.flow_emb_dim)
            tokens = torch.cat([emb, corrs, ffeats], dim=-1)
            out = self.updateformer(tokens.transpose(0, 1)).transpose(0, 1)
            coords = coords + out[..., :2]
            delta_f = out[..., 2:]
            s, n, c = delta_f.shape
            delta_f = self.norm(delta_f.reshape(s * n, c)).reshape(s, n, c)
            ffeats = ffeats + self.ffeat_updater(delta_f)
        vis = self.vis_predictor(ffeats)[..., 0]
        return coords, vis, ffeats

    @torch.no_grad()
    def track(self, video, queries, num_frames=None):
        """video (f, 3, h, w) in [0,1]; queries (n, 2) normalized [0,1]."""
        f, _, h, w = video.shape
        num_frames = num_frames or f
        s, hop = self.S, self.S // 2
        nw = max(1, -(-(max(num_frames, s) - s) // hop) + 1)
        pad = (nw - 1) * hop + s - f
        images = video * 2 - 1
        if pad:
            images = torch.cat([images, images[-1:].repeat(pad, 1, 1, 1)])
        fmaps = self.fnet(images)
        wh = torch.tensor([w, h], dtype=torch.float32)
        coords0 = queries * wh / self.stride
        n = queries.shape[0]
        feats0 = self._sample(fmaps[0:1], coords0[None])[0].T  # (n, c)
        coords = coords0.expand(s, n, 2).clone()
        ffeats = feats0.expand(s, n, self.latent_dim).clone()
        total = (nw - 1) * hop + s
        xy = torch.zeros(total, n, 2)
        vis = torch.zeros(total, n)
        for wi in range(nw):
            st = wi * hop
            c_out, v_out, f_out = self.window_forward(
                fmaps[st : st + s], coords, ffeats
            )
            xy[st : st + s] = c_out
            vis[st : st + s] = v_out
            coords = torch.cat(
                [c_out[hop:], c_out[-1:].expand(hop, n, 2)], dim=0
            )
            ffeats = torch.cat(
                [f_out[hop:], f_out[-1:].expand(hop, n, self.latent_dim)],
                dim=0,
            )
        return xy[:f] * self.stride / wh, vis[:f]
