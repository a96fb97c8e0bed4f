"""From-scratch wasm32 MVP(+sign-ext) interpreter — Python prototype used to
reverse and verify the wasmedge-bindgen call protocol of the reference
artifact before porting to Scala. Not shipped in the library."""
import struct, math, sys
from wasmdec import Module, walk_ops

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF

def s32(v): v &= MASK32; return v - (1<<32) if v & 0x80000000 else v
def s64(v): v &= MASK64; return v - (1<<64) if v & 0x8000000000000000 else v

class Trap(Exception): pass

class Func:
    __slots__=('idx','params','results','locals','ops','targets','arities')
    def __init__(self, mod, idx):
        self.idx=idx
        ps,rs = mod.types[mod.funcs[idx]]
        self.params=len(ps); self.results=len(rs)
        locs, _ = mod.codes[idx]
        self.locals=locs
        ops = walk_ops(mod, idx)
        self.ops = ops
        # resolve structured control: for each op index of block/loop, find end;
        # br depth -> target op index + stack height handling
        stack=[]  # (kind, opindex)
        targets={}  # opidx of block/loop -> matching end opidx
        for i,(at,op,imm) in enumerate(ops):
            if op in (0x02,0x03): stack.append((op,i))
            elif op==0x0b:
                if stack:
                    k,j = stack.pop(); targets[j]=i
        self.targets=targets

class Instance:
    def __init__(self, mod):
        self.mod=mod
        self.funcs=[Func(mod,i) for i in range(len(mod.codes))]
        self.mem=bytearray(mod.mempages*65536)
        for off,blob in mod.datas:
            self.mem[off:off+len(blob)]=blob
        self.globals=[g[2] for g in mod.globals]
        self.table=mod.table
        self.icount=0
        self.trace_reads=None  # optional (lo,hi) range to log loads
        self.call_trace=None

    def grow(self, pages):
        cur=len(self.mem)//65536
        if pages<0 or cur+pages>65536: return -1
        self.mem.extend(bytes(pages*65536))
        return cur

    def invoke(self, name, args):
        k,idx = self.mod.exports[name]
        return self.call(idx, list(args))

    def call(self, fidx, args):
        f=self.funcs[fidx]
        locals_=args+[0]*len(f.locals)
        # zero-init: ints 0, floats 0.0
        for i,t in enumerate(f.locals):
            locals_[f.params+i] = 0.0 if t in (0x7d,0x7c) else 0
        ops=f.ops; targets=f.targets
        st=[]  # value stack
        ctrl=[]  # (kind, opidx, stack_height) for blocks/loops in this frame
        mem=self.mem; g=self.globals
        i=0; n=len(ops)
        while i<n:
            at,op,imm=ops[i]
            self.icount+=1
            if op==0x20: st.append(locals_[imm])
            elif op==0x21: locals_[imm]=st.pop()
            elif op==0x22: locals_[imm]=st[-1]
            elif op==0x41: st.append(imm & MASK32)
            elif op==0x6a: b=st.pop(); st.append((st.pop()+b)&MASK32)
            elif op==0x6b: b=st.pop(); st.append((st.pop()-b)&MASK32)
            elif op==0x28:
                a=(st.pop()+imm[1])&MASK32
                if a+4>len(mem): raise Trap('oob load @%d'%a)
                st.append(int.from_bytes(mem[a:a+4],'little'))
            elif op==0x36:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32
                if a+4>len(mem): raise Trap('oob store @%d'%a)
                mem[a:a+4]=(v&MASK32).to_bytes(4,'little')
            elif op==0x02 or op==0x03:
                ctrl.append((op,i,len(st)))
            elif op==0x0b:
                if ctrl and ctrl[-1][1]==  -1: pass
                if ctrl:
                    # pop matching ctrl if this end closes it
                    k,j,h = ctrl[-1]
                    if targets.get(j)==i: ctrl.pop()
            elif op==0x0c or (op==0x0d and st.pop()!=0):
                d=imm
                # find target ctrl entry
                ci=len(ctrl)-1-d
                k,j,h=ctrl[ci]
                if k==0x03:  # loop: jump to loop start, keep ctrl up to and incl loop
                    del ctrl[ci+1:]
                    del st[h:]
                    i=j  # loop op re-pushes? we keep the entry; jump to j+1
                    i=j
                    # we already have its ctrl entry at ci; continue after loop op
                    i=j  # will i+=1 at bottom -> first op in loop body
                else:
                    del ctrl[ci:]
                    del st[h:]  # void blocks everywhere (verified: bt==0x40)
                    i=targets[j]
            elif op==0x0d: pass  # br_if false
            elif op==0x0e:
                v=st.pop(); tbl=imm
                d = tbl[v] if v<len(tbl)-1 else tbl[-1]
                ci=len(ctrl)-1-d
                k,j,h=ctrl[ci]
                if k==0x03:
                    del ctrl[ci+1:]; del st[h:]; i=j
                else:
                    del ctrl[ci:]; del st[h:]; i=targets[j]
            elif op==0x10:
                callee=self.funcs[imm]
                nargs=callee.params
                a=st[len(st)-nargs:]; del st[len(st)-nargs:]
                if self.call_trace: self.call_trace(imm, a)
                r=self.call(imm,a)
                st.extend(r)
            elif op==0x11:
                ti,_=imm
                eidx=st.pop()
                if eidx>=len(self.table) or self.table[eidx] is None:
                    raise Trap('call_indirect oob/null %d'%eidx)
                fi=self.table[eidx]
                if self.mod.funcs[fi]!=ti:
                    raise Trap('call_indirect type mismatch')
                callee=self.funcs[fi]
                nargs=callee.params
                a=st[len(st)-nargs:]; del st[len(st)-nargs:]
                r=self.call(fi,a)
                st.extend(r)
            elif op==0x0f:
                break
            elif op==0x00: raise Trap('unreachable at func %d @%d'%(fidx,at))
            elif op==0x01: pass
            elif op==0x1a: st.pop()
            elif op==0x1b:
                c=st.pop(); b=st.pop(); a=st.pop(); st.append(a if c else b)
            elif op==0x23: st.append(g[imm])
            elif op==0x24: g[imm]=st.pop()
            elif op==0x29:
                a=(st.pop()+imm[1])&MASK32
                if a+8>len(mem): raise Trap('oob')
                st.append(int.from_bytes(mem[a:a+8],'little'))
            elif op==0x2a:
                a=(st.pop()+imm[1])&MASK32; st.append(struct.unpack_from('<f',mem,a)[0])
            elif op==0x2b:
                a=(st.pop()+imm[1])&MASK32; st.append(struct.unpack_from('<d',mem,a)[0])
            elif op==0x2c:
                a=(st.pop()+imm[1])&MASK32; v=mem[a]; st.append((v-256 if v&0x80 else v)&MASK32)
            elif op==0x2d:
                a=(st.pop()+imm[1])&MASK32; st.append(mem[a])
            elif op==0x2e:
                a=(st.pop()+imm[1])&MASK32; v=int.from_bytes(mem[a:a+2],'little'); st.append((v-65536 if v&0x8000 else v)&MASK32)
            elif op==0x2f:
                a=(st.pop()+imm[1])&MASK32; st.append(int.from_bytes(mem[a:a+2],'little'))
            elif op==0x30:
                a=(st.pop()+imm[1])&MASK32; v=mem[a]; st.append((v-256 if v&0x80 else v)&MASK64)
            elif op==0x31:
                a=(st.pop()+imm[1])&MASK32; st.append(mem[a])
            elif op==0x32:
                a=(st.pop()+imm[1])&MASK32; v=int.from_bytes(mem[a:a+2],'little'); st.append((v-65536 if v&0x8000 else v)&MASK64)
            elif op==0x33:
                a=(st.pop()+imm[1])&MASK32; st.append(int.from_bytes(mem[a:a+2],'little'))
            elif op==0x34:
                a=(st.pop()+imm[1])&MASK32; v=int.from_bytes(mem[a:a+4],'little'); st.append((v-(1<<32) if v&0x80000000 else v)&MASK64)
            elif op==0x35:
                a=(st.pop()+imm[1])&MASK32; st.append(int.from_bytes(mem[a:a+4],'little'))
            elif op==0x37:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32
                mem[a:a+8]=(v&MASK64).to_bytes(8,'little')
            elif op==0x38:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32; struct.pack_into('<f',mem,a,v)
            elif op==0x39:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32; struct.pack_into('<d',mem,a,v)
            elif op==0x3a:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32; mem[a]=v&0xFF
            elif op==0x3b:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32; mem[a:a+2]=(v&0xFFFF).to_bytes(2,'little')
            elif op==0x3c:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32; mem[a]=v&0xFF
            elif op==0x3d:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32; mem[a:a+2]=(v&0xFFFF).to_bytes(2,'little')
            elif op==0x3e:
                v=st.pop(); a=(st.pop()+imm[1])&MASK32; mem[a:a+4]=(v&MASK32).to_bytes(4,'little')
            elif op==0x3f: st.append(len(mem)//65536)
            elif op==0x40: st.append(self.grow(st.pop())&MASK32)
            elif op==0x42: st.append(imm & MASK64)
            elif op==0x43 or op==0x44: st.append(imm)
            elif op==0x45: st.append(1 if st.pop()==0 else 0)
            elif op==0x46: b=st.pop(); st.append(1 if st.pop()==b else 0)
            elif op==0x47: b=st.pop(); st.append(1 if st.pop()!=b else 0)
            elif op==0x48: b=s32(st.pop()); st.append(1 if s32(st.pop())<b else 0)
            elif op==0x49: b=st.pop(); st.append(1 if st.pop()<b else 0)
            elif op==0x4a: b=s32(st.pop()); st.append(1 if s32(st.pop())>b else 0)
            elif op==0x4b: b=st.pop(); st.append(1 if st.pop()>b else 0)
            elif op==0x4c: b=s32(st.pop()); st.append(1 if s32(st.pop())<=b else 0)
            elif op==0x4d: b=st.pop(); st.append(1 if st.pop()<=b else 0)
            elif op==0x4e: b=s32(st.pop()); st.append(1 if s32(st.pop())>=b else 0)
            elif op==0x4f: b=st.pop(); st.append(1 if st.pop()>=b else 0)
            elif op==0x50: st.append(1 if st.pop()==0 else 0)
            elif op==0x51: b=st.pop(); st.append(1 if st.pop()==b else 0)
            elif op==0x52: b=st.pop(); st.append(1 if st.pop()!=b else 0)
            elif op==0x53: b=s64(st.pop()); st.append(1 if s64(st.pop())<b else 0)
            elif op==0x54: b=st.pop(); st.append(1 if st.pop()<b else 0)
            elif op==0x55: b=s64(st.pop()); st.append(1 if s64(st.pop())>b else 0)
            elif op==0x56: b=st.pop(); st.append(1 if st.pop()>b else 0)
            elif op==0x57: b=s64(st.pop()); st.append(1 if s64(st.pop())<=b else 0)
            elif op==0x58: b=st.pop(); st.append(1 if st.pop()<=b else 0)
            elif op==0x59: b=s64(st.pop()); st.append(1 if s64(st.pop())>=b else 0)
            elif op==0x5a: b=st.pop(); st.append(1 if st.pop()>=b else 0)
            elif 0x5b<=op<=0x60:  # f32 cmp
                b=st.pop(); a=st.pop()
                r={0x5b:a==b,0x5c:a!=b,0x5d:a<b,0x5e:a>b,0x5f:a<=b,0x60:a>=b}[op]
                st.append(1 if r else 0)
            elif 0x61<=op<=0x66:  # f64 cmp
                b=st.pop(); a=st.pop()
                r={0x61:a==b,0x62:a!=b,0x63:a<b,0x64:a>b,0x65:a<=b,0x66:a>=b}[op]
                st.append(1 if r else 0)
            elif op==0x67: v=st.pop(); st.append(32 if v==0 else 32-v.bit_length())
            elif op==0x68:
                v=st.pop(); st.append(32 if v==0 else (v&-v).bit_length()-1)
            elif op==0x69: st.append(bin(st.pop()).count('1'))
            elif op==0x6c: b=st.pop(); st.append((st.pop()*b)&MASK32)
            elif op==0x6d:
                b=s32(st.pop()); a=s32(st.pop())
                if b==0: raise Trap('div0')
                if a==-2147483648 and b==-1: raise Trap('overflow')
                st.append(int(math.trunc(a/b))&MASK32) if False else st.append((abs(a)//abs(b)*(1 if (a<0)==(b<0) else -1))&MASK32)
            elif op==0x6e:
                b=st.pop(); a=st.pop()
                if b==0: raise Trap('div0')
                st.append(a//b)
            elif op==0x6f:
                b=s32(st.pop()); a=s32(st.pop())
                if b==0: raise Trap('rem0')
                q=abs(a)//abs(b)*(1 if (a<0)==(b<0) else -1)
                st.append((a-q*b)&MASK32)
            elif op==0x70:
                b=st.pop(); a=st.pop()
                if b==0: raise Trap('rem0')
                st.append(a%b)
            elif op==0x71: b=st.pop(); st.append(st.pop()&b)
            elif op==0x72: b=st.pop(); st.append(st.pop()|b)
            elif op==0x73: b=st.pop(); st.append(st.pop()^b)
            elif op==0x74: b=st.pop()&31; st.append((st.pop()<<b)&MASK32)
            elif op==0x75: b=st.pop()&31; st.append((s32(st.pop())>>b)&MASK32)
            elif op==0x76: b=st.pop()&31; st.append(st.pop()>>b)
            elif op==0x77: b=st.pop()&31; a=st.pop(); st.append(((a<<b)|(a>>(32-b)))&MASK32 if b else a)
            elif op==0x78: b=st.pop()&31; a=st.pop(); st.append(((a>>b)|(a<<(32-b)))&MASK32 if b else a)
            elif op==0x79: v=st.pop(); st.append(64 if v==0 else 64-v.bit_length())
            elif op==0x7a: v=st.pop(); st.append(64 if v==0 else (v&-v).bit_length()-1)
            elif op==0x7b: st.append(bin(st.pop()).count('1'))
            elif op==0x7c: b=st.pop(); st.append((st.pop()+b)&MASK64)
            elif op==0x7d: b=st.pop(); st.append((st.pop()-b)&MASK64)
            elif op==0x7e: b=st.pop(); st.append((st.pop()*b)&MASK64)
            elif op==0x7f:
                b=s64(st.pop()); a=s64(st.pop())
                if b==0: raise Trap('div0')
                if a==-(1<<63) and b==-1: raise Trap('overflow')
                st.append((abs(a)//abs(b)*(1 if (a<0)==(b<0) else -1))&MASK64)
            elif op==0x80:
                b=st.pop(); a=st.pop()
                if b==0: raise Trap('div0')
                st.append(a//b)
            elif op==0x81:
                b=s64(st.pop()); a=s64(st.pop())
                if b==0: raise Trap('rem0')
                q=abs(a)//abs(b)*(1 if (a<0)==(b<0) else -1)
                st.append((a-q*b)&MASK64)
            elif op==0x82:
                b=st.pop(); a=st.pop()
                if b==0: raise Trap('rem0')
                st.append(a%b)
            elif op==0x83: b=st.pop(); st.append(st.pop()&b)
            elif op==0x84: b=st.pop(); st.append(st.pop()|b)
            elif op==0x85: b=st.pop(); st.append(st.pop()^b)
            elif op==0x86: b=st.pop()&63; st.append((st.pop()<<b)&MASK64)
            elif op==0x87: b=st.pop()&63; st.append((s64(st.pop())>>b)&MASK64)
            elif op==0x88: b=st.pop()&63; st.append(st.pop()>>b)
            elif op==0x89: b=st.pop()&63; a=st.pop(); st.append(((a<<b)|(a>>(64-b)))&MASK64 if b else a)
            elif op==0x8a: b=st.pop()&63; a=st.pop(); st.append(((a>>b)|(a<<(64-b)))&MASK64 if b else a)
            elif 0x8b<=op<=0x98:  # f32 unop/binop
                if op in (0x8b,0x8c,0x8d,0x8e,0x8f,0x90,0x91):
                    a=st.pop()
                    r={0x8b:abs(a),0x8c:-a,0x8d:math.ceil(a),0x8e:math.floor(a),0x8f:math.trunc(a),0x90:_nearest(a),0x91:math.sqrt(a) if a>=0 else float('nan')}[op]
                else:
                    b=st.pop();a=st.pop()
                    r={0x92:a+b,0x93:a-b,0x94:a*b,0x95:_fdiv(a,b),0x96:min(a,b),0x97:max(a,b),0x98:math.copysign(abs(a),b)}[op]
                st.append(struct.unpack('<f',struct.pack('<f',r))[0])
            elif op in (0x99,0x9a,0x9b,0x9c,0x9d,0x9e,0x9f):
                a=st.pop()
                st.append({0x99:abs(a),0x9a:-a,0x9b:float(math.ceil(a)) if math.isfinite(a) else a,0x9c:float(math.floor(a)) if math.isfinite(a) else a,0x9d:float(math.trunc(a)) if math.isfinite(a) else a,0x9e:_nearest(a),0x9f:math.sqrt(a) if a>=0 else float('nan')}[op])
            elif op==0xa0: b=st.pop(); st.append(st.pop()+b)
            elif op==0xa1: b=st.pop(); st.append(st.pop()-b)
            elif op==0xa2: b=st.pop(); st.append(st.pop()*b)
            elif op==0xa3: b=st.pop(); st.append(_fdiv(st.pop(),b))
            elif op==0xa4: b=st.pop(); a=st.pop(); st.append(_fmin(a,b))
            elif op==0xa5: b=st.pop(); a=st.pop(); st.append(_fmax(a,b))
            elif op==0xa6: b=st.pop(); a=st.pop(); st.append(math.copysign(abs(a),b))
            elif op==0xa7: st.append(st.pop()&MASK32)
            elif op in (0xa8,0xaa):
                a=st.pop()
                if math.isnan(a) or a>=2147483648.0 or a<-2147483649.0: raise Trap('trunc')
                st.append(int(math.trunc(a))&MASK32)
            elif op in (0xa9,0xab):
                a=st.pop()
                if math.isnan(a) or a>=4294967296.0 or a<=-1.0: raise Trap('trunc')
                st.append(int(math.trunc(a))&MASK32)
            elif op==0xac: st.append(s32(st.pop())&MASK64)
            elif op==0xad: st.append(st.pop())
            elif op in (0xae,0xb0):
                a=st.pop()
                if math.isnan(a) or a>=9.223372036854776e18 or a<-9.223372036854778e18: raise Trap('trunc')
                st.append(int(math.trunc(a))&MASK64)
            elif op in (0xaf,0xb1):
                a=st.pop()
                if math.isnan(a) or a>=1.8446744073709552e19 or a<=-1.0: raise Trap('trunc')
                st.append(int(math.trunc(a))&MASK64)
            elif op==0xb2: st.append(struct.unpack('<f',struct.pack('<f',float(s32(st.pop()))))[0])
            elif op==0xb3: st.append(struct.unpack('<f',struct.pack('<f',float(st.pop())))[0])
            elif op==0xb4: st.append(struct.unpack('<f',struct.pack('<f',float(s64(st.pop()))))[0])
            elif op==0xb5: st.append(struct.unpack('<f',struct.pack('<f',float(st.pop())))[0])
            elif op==0xb6: st.append(struct.unpack('<f',struct.pack('<f',st.pop()))[0])
            elif op==0xb7: st.append(float(s32(st.pop())))
            elif op==0xb8: st.append(float(st.pop()))
            elif op==0xb9: st.append(float(s64(st.pop())))
            elif op==0xba: st.append(float(st.pop()))
            elif op==0xbb: st.append(st.pop())
            elif op==0xbc: st.append(struct.unpack('<I',struct.pack('<f',st.pop()))[0])
            elif op==0xbd: st.append(struct.unpack('<Q',struct.pack('<d',st.pop()))[0])
            elif op==0xbe: st.append(struct.unpack('<f',struct.pack('<I',st.pop()&MASK32))[0])
            elif op==0xbf: st.append(struct.unpack('<d',struct.pack('<Q',st.pop()&MASK64))[0])
            elif op==0xc0: v=st.pop()&0xFF; st.append((v-256 if v&0x80 else v)&MASK32)
            elif op==0xc1: v=st.pop()&0xFFFF; st.append((v-65536 if v&0x8000 else v)&MASK32)
            elif op==0xc2: v=st.pop()&0xFF; st.append((v-256 if v&0x80 else v)&MASK64)
            elif op==0xc3: v=st.pop()&0xFFFF; st.append((v-65536 if v&0x8000 else v)&MASK64)
            elif op==0xc4: v=st.pop()&MASK32; st.append((v-(1<<32) if v&0x80000000 else v)&MASK64)
            else: raise Trap('unimplemented op %s'%hex(op))
            i+=1
        return st[len(st)-f.results:] if f.results else []

def _nearest(a):
    if not math.isfinite(a): return a
    f=math.floor(a); c=math.ceil(a); d=a-f
    if d<0.5: r=f
    elif d>0.5: r=c
    else: r=f if f%2==0 else c
    return float(r)
def _fdiv(a,b):
    try: return a/b
    except ZeroDivisionError:
        if a==0 or math.isnan(a): return float('nan')
        return math.copysign(float('inf'), a)*math.copysign(1,b)
def _fmin(a,b):
    if math.isnan(a) or math.isnan(b): return float('nan')
    if a==b==0: return -0.0 if (math.copysign(1,a)<0 or math.copysign(1,b)<0) else 0.0
    return min(a,b)
def _fmax(a,b):
    if math.isnan(a) or math.isnan(b): return float('nan')
    if a==b==0: return 0.0 if (math.copysign(1,a)>0 or math.copysign(1,b)>0) else -0.0
    return max(a,b)

if __name__=='__main__':
    sys.setrecursionlimit(200000)
    mod=Module('/root/reference/wasm_function.wasm')
    inst=Instance(mod)
    p=inst.invoke('allocate',[100])
    print('allocate(100) ->', p)
    p2=inst.invoke('allocate',[100])
    print('allocate(100) ->', p2)
    inst.invoke('deallocate',[p2[0],100])
    print('dealloc ok, icount=', inst.icount)
