"""Torch golden-model mirror of the SD1.x architecture, with diffusers
parameter naming, used to validate the Flax models and the torch->Flax
converters without diffusers installed. Architecture statements follow
SURVEY.md §2.2 D1/D2 and the public SD1.x model card."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000.0, freq_shift=0.0):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - freq_shift)
    freqs = torch.exp(exponent)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)  # flip_sin_to_cos


class Resnet(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-5, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return skip + h


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim), nn.Dropout(0.0))

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        q = self.to_q(x).view(b, n, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(context).view(b, -1, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(context).view(b, -1, self.heads, self.dim_head).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.dim_head**-0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads, dim // heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, context_dim, heads, dim // heads)
        self.norm3 = nn.LayerNorm(dim)
        # key parity with diffusers: ff.net.0.proj / ff.net.2
        self.ff = nn.ModuleDict({"net": nn.ModuleList([GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim)])})

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        h = self.norm3(x)
        h = self.ff["net"][0](h)
        h = self.ff["net"][2](h)
        return x + h


class SpatialTransformer(nn.Module):
    def __init__(self, ch, context_dim, heads, depth=1, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, context_dim, heads) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            y = blk(y, context)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class Downsample(nn.Module):
    def __init__(self, ch, asymmetric=False):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, layers, cross, context_dim, heads,
                 add_downsample, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList(
            [Resnet(in_ch if j == 0 else out_ch, out_ch, temb_ch, groups=groups) for j in range(layers)]
        )
        self.attentions = (
            nn.ModuleList([SpatialTransformer(out_ch, context_dim, heads, groups=groups) for _ in range(layers)])
            if cross else None
        )
        self.downsamplers = nn.ModuleList([Downsample(out_ch)]) if add_downsample else None

    def forward(self, x, temb, context):
        res = ()
        for j, r in enumerate(self.resnets):
            x = r(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, context)
            res += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            res += (x,)
        return x, res


class UpBlock(nn.Module):
    def __init__(self, prev_ch, out_ch, skip_chs, temb_ch, layers, cross, context_dim,
                 heads, add_upsample, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList(
            [Resnet((prev_ch if j == 0 else out_ch) + skip_chs[j], out_ch, temb_ch, groups=groups)
             for j in range(layers)]
        )
        self.attentions = (
            nn.ModuleList([SpatialTransformer(out_ch, context_dim, heads, groups=groups) for _ in range(layers)])
            if cross else None
        )
        self.upsamplers = nn.ModuleList([Upsample(out_ch)]) if add_upsample else None

    def forward(self, x, res_stack, temb, context):
        for j, r in enumerate(self.resnets):
            skip = res_stack.pop()
            x = r(torch.cat([x, skip], dim=1), temb)
            if self.attentions is not None:
                x = self.attentions[j](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class MidBlock(nn.Module):
    def __init__(self, ch, temb_ch, context_dim, heads, groups=32, use_temb=True, vae_attn=False):
        super().__init__()
        self.resnets = nn.ModuleList([
            Resnet(ch, ch, temb_ch if use_temb else None, eps=1e-6 if vae_attn else 1e-5, groups=groups),
            Resnet(ch, ch, temb_ch if use_temb else None, eps=1e-6 if vae_attn else 1e-5, groups=groups),
        ])
        if vae_attn:
            self.attentions = nn.ModuleList([VAEAttention(ch, groups)])
        else:
            self.attentions = nn.ModuleList([SpatialTransformer(ch, context_dim, heads, groups=groups)])

    def forward(self, x, temb=None, context=None):
        x = self.resnets[0](x, temb)
        a = self.attentions[0]
        x = a(x) if isinstance(a, VAEAttention) else a(x, context)
        return self.resnets[1](x, temb)


class TorchMiniUNet(nn.Module):
    """diffusers-shaped UNet2DConditionModel (configurable mini version)."""

    def __init__(self, in_ch=4, out_ch=4, block_out=(32, 64), layers=2,
                 cross=(True, False), context_dim=24, heads=2, groups=32):
        super().__init__()
        temb_ch = block_out[0] * 4
        self.block_out, self.groups = block_out, groups
        self.conv_in = nn.Conv2d(in_ch, block_out[0], 3, padding=1)
        self.time_embedding = nn.ModuleDict({
            "linear_1": nn.Linear(block_out[0], temb_ch),
            "linear_2": nn.Linear(temb_ch, temb_ch),
        })
        n = len(block_out)
        self.down_blocks = nn.ModuleList()
        ch = block_out[0]
        for i, oc in enumerate(block_out):
            self.down_blocks.append(
                DownBlock(ch, oc, temb_ch, layers, cross[i], context_dim, heads,
                          add_downsample=(i < n - 1), groups=groups)
            )
            ch = oc
        self.mid_block = MidBlock(block_out[-1], temb_ch, context_dim, heads, groups=groups)
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(block_out))
        rev_cross = list(reversed(cross))
        prev = rev[0]
        for i, oc in enumerate(rev):
            # skip channels come off the stack: see forward for stack layout
            self.up_blocks.append(
                UpBlock(prev, oc, self._skip_chs(i, layers), temb_ch, layers + 1,
                        rev_cross[i], context_dim, heads,
                        add_upsample=(i < n - 1), groups=groups)
            )
            prev = oc
        self.conv_norm_out = nn.GroupNorm(groups, block_out[0], eps=1e-5)
        self.conv_out = nn.Conv2d(block_out[0], out_ch, 3, padding=1)

    def _skip_chs(self, i, layers):
        # res stack: [conv_in(c0)] + per block: layers x out_ch + downsample out_ch
        block_out = list(self.block_out)
        n = len(block_out)
        stack = [block_out[0]]
        for bi, oc in enumerate(block_out):
            stack += [oc] * layers
            if bi < n - 1:
                stack.append(oc)
        # up block i pops layers+1 entries
        start = len(stack) - (layers + 1) * (i + 1)
        popped = stack[start:start + layers + 1][::-1]
        return popped

    def forward(self, x, t, context):
        temb = timestep_embedding(t, self.block_out[0])
        temb = self.time_embedding["linear_2"](F.silu(self.time_embedding["linear_1"](temb)))
        h = self.conv_in(x)
        stack = [h]
        for blk in self.down_blocks:
            h, res = blk(h, temb, context)
            stack.extend(res)
        h = self.mid_block(h, temb, context)
        for blk in self.up_blocks:
            h = blk(h, stack, temb, context)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# VAE mirror
# ---------------------------------------------------------------------------


class VAEAttention(nn.Module):
    def __init__(self, ch, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.query = nn.Linear(ch, ch)
        self.key = nn.Linear(ch, ch)
        self.value = nn.Linear(ch, ch)
        self.proj_attn = nn.Linear(ch, ch)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.query(y), self.key(y), self.value(y)
        attn = torch.softmax(q @ k.transpose(-1, -2) * c**-0.5, dim=-1)
        y = self.proj_attn(attn @ v)
        return x + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TorchMiniVAE(nn.Module):
    def __init__(self, block_out=(32, 64), layers=2, latent=4, groups=32):
        super().__init__()
        n = len(block_out)
        self.encoder = nn.Module()
        self.encoder.conv_in = nn.Conv2d(3, block_out[0], 3, padding=1)
        self.encoder.down_blocks = nn.ModuleList()
        ch = block_out[0]
        for i, oc in enumerate(block_out):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [Resnet(ch if j == 0 else oc, oc, None, eps=1e-6, groups=groups) for j in range(layers)]
            )
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([Downsample(oc, asymmetric=True)])
            self.encoder.down_blocks.append(blk)
            ch = oc
        self.encoder.mid_block = MidBlock(block_out[-1], None, None, None,
                                          groups=groups, use_temb=False, vae_attn=True)
        self.encoder.conv_norm_out = nn.GroupNorm(groups, block_out[-1], eps=1e-6)
        self.encoder.conv_out = nn.Conv2d(block_out[-1], 2 * latent, 3, padding=1)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)

        rev = list(reversed(block_out))
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)
        self.decoder = nn.Module()
        self.decoder.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.decoder.mid_block = MidBlock(rev[0], None, None, None,
                                          groups=groups, use_temb=False, vae_attn=True)
        self.decoder.up_blocks = nn.ModuleList()
        ch = rev[0]
        for i, oc in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [Resnet(ch if j == 0 else oc, oc, None, eps=1e-6, groups=groups) for j in range(layers + 1)]
            )
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([Upsample(oc)])
            self.decoder.up_blocks.append(blk)
            ch = oc
        self.decoder.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.decoder.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def encode(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = e.mid_block(h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block(h)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))
