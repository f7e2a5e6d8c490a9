"""Torch replica of canonical RAFT-large (princeton-vl/RAFT `raft-*.pth`
schema), written from the public architecture to serve as an offline oracle
for the JAX port (`flowmap_tpu/flow/raft.py`) — torchvision is not in this
image, and the checkpoints are unreachable (zero egress).

Key names match the princeton checkpoint layout exactly (fnet.*, cnet.*,
update_block.*), so `convert_torch_state_dict(replica.state_dict())` must
consume every key.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _norm(kind, c):
    if kind == "instance":
        return nn.InstanceNorm2d(c)  # affine=False, no params
    if kind == "batch":
        return nn.BatchNorm2d(c)
    return nn.Identity()


class ResidualBlock(nn.Module):
    def __init__(self, cin, cout, kind, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.norm1 = _norm(kind, cout)
        self.norm2 = _norm(kind, cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride), _norm(kind, cout)
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
    def __init__(self, kind, out_ch=256):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = _norm(kind, 64)
        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for i, (cin, cout, stride) in enumerate(dims, start=1):
            self.add_module(
                f"layer{i}",
                nn.Sequential(
                    ResidualBlock(cin, cout, kind, stride),
                    ResidualBlock(cout, cout, kind, 1),
                ),
            )
        self.conv2 = nn.Conv2d(128, out_ch, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.conv2(x)


class BasicMotionEncoder(nn.Module):
    def __init__(self, corr_ch):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_ch, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(192 + 64, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        c = F.relu(self.convc1(corr))
        c = F.relu(self.convc2(c))
        f = F.relu(self.convf1(flow))
        f = F.relu(self.convf2(f))
        out = F.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class SepConvGRU(nn.Module):
    def __init__(self, hidden=128, inp=128 + 128):
        super().__init__()
        cin = hidden + inp
        self.convz1 = nn.Conv2d(cin, hidden, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(cin, hidden, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(cin, hidden, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(cin, hidden, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(cin, hidden, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(cin, hidden, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(128, 256, 3, padding=1)
        self.conv2 = nn.Conv2d(256, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class BasicUpdateBlock(nn.Module):
    def __init__(self, corr_ch):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_ch)
        self.gru = SepConvGRU()
        self.flow_head = FlowHead()
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1),
            nn.ReLU(inplace=False),
            nn.Conv2d(256, 64 * 9, 1),
        )

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        delta = self.flow_head(net)
        mask = 0.25 * self.mask(net)
        return net, mask, delta


def bilinear_sampler(img, coords):
    """RAFT's utils.bilinear_sampler: align_corners=True, zeros padding."""
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class CorrBlock:
    def __init__(self, f0, f1, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        b, c, h, w = f0.shape
        corr = torch.matmul(
            f0.view(b, c, h * w).transpose(1, 2), f1.view(b, c, h * w)
        )
        corr = corr.view(b, h, w, 1, h, w) / (c ** 0.5)
        self.pyramid = [corr.view(b * h * w, 1, h, w)]
        for _ in range(num_levels - 1):
            self.pyramid.append(F.avg_pool2d(self.pyramid[-1], 2, stride=2))

    def __call__(self, coords):
        r = self.radius
        coords = coords.permute(0, 2, 3, 1)
        b, h, w, _ = coords.shape
        out = []
        for i, corr in enumerate(self.pyramid):
            dx = torch.linspace(-r, r, 2 * r + 1)
            dy = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
            delta = delta.flip(-1)  # (dy, dx) -> (dx, dy) i.e. xy order
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            window = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
            sampled = bilinear_sampler(corr, window)
            out.append(sampled.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


class RaftTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = BasicEncoder("instance")
        self.cnet = BasicEncoder("batch")
        corr_ch = 4 * (2 * 4 + 1) ** 2
        self.update_block = BasicUpdateBlock(corr_ch)

    @staticmethod
    def coords_grid(b, h, w):
        ys, xs = torch.meshgrid(
            torch.arange(h, dtype=torch.float32),
            torch.arange(w, dtype=torch.float32),
            indexing="ij",
        )
        return torch.stack([xs, ys], dim=0)[None].repeat(b, 1, 1, 1)

    @staticmethod
    def upsample_flow(flow, mask):
        N, _, H, W = flow.shape
        mask = mask.view(N, 1, 9, 8, 8, H, W)
        mask = torch.softmax(mask, dim=2)
        up_flow = F.unfold(8 * flow, [3, 3], padding=1)
        up_flow = up_flow.view(N, 2, 9, 1, 1, H, W)
        up_flow = torch.sum(mask * up_flow, dim=2)
        up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
        return up_flow.reshape(N, 2, 8 * H, 8 * W)

    def forward(self, img0, img1, iters=4):
        """Images in [0, 1]; returns full-res pixel flow (N, 2, H, W)."""
        x0 = 2 * img0 - 1
        x1 = 2 * img1 - 1
        f0 = self.fnet(x0)
        f1 = self.fnet(x1)
        corr_fn = CorrBlock(f0, f1)
        context = self.cnet(x0)
        net, inp = torch.split(context, [128, 128], dim=1)
        net = torch.tanh(net)
        inp = F.relu(inp)
        b, _, h8, w8 = f0.shape
        coords0 = self.coords_grid(b, h8, w8)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
        return self.upsample_flow(coords1 - coords0, mask)
