"""Minimal wasm32 binary decoder — scoping tool for the from-scratch
Scala interpreter (reference artifact: /root/reference/wasm_function.wasm).
Public spec: https://webassembly.github.io/spec/core/binary/
"""
import struct, sys, collections

class Reader:
    def __init__(self, data, pos=0):
        self.d = data; self.p = pos
    def byte(self):
        b = self.d[self.p]; self.p += 1; return b
    def bytes(self, n):
        r = self.d[self.p:self.p+n]; self.p += n; return r
    def u32(self):
        r=0;s=0
        while True:
            b=self.byte(); r |= (b&0x7f)<<s
            if not b&0x80: return r
            s+=7
    def i32(self):
        r=0;s=0
        while True:
            b=self.byte(); r |= (b&0x7f)<<s; s+=7
            if not b&0x80:
                if s<32 and b&0x40: r |= -1<<s
                return r
    def i64(self):
        r=0;s=0
        while True:
            b=self.byte(); r |= (b&0x7f)<<s; s+=7
            if not b&0x80:
                if s<64 and b&0x40: r |= -1<<s
                return r
    def f32(self): return struct.unpack('<f', self.bytes(4))[0]
    def f64(self): return struct.unpack('<d', self.bytes(8))[0]
    def name(self):
        n=self.u32(); return self.bytes(n).decode()

class Module:
    def __init__(self, path):
        data = open(path,'rb').read()
        assert data[:8] == b'\x00asm\x01\x00\x00\x00'
        r = Reader(data, 8)
        self.types=[]; self.funcs=[]; self.table=None; self.mempages=0
        self.globals=[]; self.exports={}; self.elem=[]; self.codes=[]; self.datas=[]
        while r.p < len(data):
            sid = r.byte(); ln = r.u32(); end = r.p + ln
            if sid==1:
                for _ in range(r.u32()):
                    assert r.byte()==0x60
                    ps=[r.byte() for _ in range(r.u32())]
                    rs=[r.byte() for _ in range(r.u32())]
                    self.types.append((ps,rs))
            elif sid==3:
                for _ in range(r.u32()): self.funcs.append(r.u32())
            elif sid==4:
                for _ in range(r.u32()):
                    et=r.byte(); fl=r.byte(); mn=r.u32()
                    mx=r.u32() if fl&1 else None
                    self.table=[None]*mn
            elif sid==5:
                for _ in range(r.u32()):
                    fl=r.byte(); mn=r.u32()
                    if fl&1: r.u32()
                    self.mempages=mn
            elif sid==6:
                for _ in range(r.u32()):
                    t=r.byte(); mut=r.byte()
                    op=r.byte()
                    if op==0x41: v=r.i32()
                    elif op==0x42: v=r.i64()
                    elif op==0x43: v=r.f32()
                    elif op==0x44: v=r.f64()
                    else: raise Exception('global init op %x'%op)
                    assert r.byte()==0x0b
                    self.globals.append([t,mut,v])
            elif sid==7:
                for _ in range(r.u32()):
                    nm=r.name(); k=r.byte(); idx=r.u32()
                    self.exports[nm]=(k,idx)
            elif sid==9:
                for _ in range(r.u32()):
                    fl=r.u32()
                    assert fl==0, 'elem flags %d'%fl
                    op=r.byte(); assert op==0x41
                    off=r.i32(); assert r.byte()==0x0b
                    n=r.u32()
                    for i in range(n):
                        self.table[off+i]=r.u32()
            elif sid==10:
                for _ in range(r.u32()):
                    sz=r.u32(); bend=r.p+sz
                    locals_=[]
                    for _ in range(r.u32()):
                        cnt=r.u32(); t=r.byte(); locals_.extend([t]*cnt)
                    body=(r.p, bend)  # code bytes [start,end) incl final 0x0b
                    self.codes.append((locals_, body))
                    r.p=bend
            elif sid==11:
                for _ in range(r.u32()):
                    fl=r.u32()
                    if fl==0:
                        op=r.byte(); assert op==0x41
                        off=r.i32(); assert r.byte()==0x0b
                        n=r.u32(); self.datas.append((off, r.bytes(n)))
                    elif fl==1:
                        n=r.u32(); self.datas.append((None, r.bytes(n)))
                    else: raise Exception('data flags')
            r.p=end
        self.data = data

# opcode immediate decode for census / disasm
def walk_ops(mod, fidx, emit=None):
    locals_, (s,e) = mod.codes[fidx]
    r = Reader(mod.data, s)
    ops = []
    while r.p < e:
        at = r.p
        op = r.byte()
        imm = None
        if op in (0x02,0x03,0x04):  # block/loop/if blocktype
            bt = r.d[r.p]
            if bt in (0x40,0x7f,0x7e,0x7d,0x7c): r.p+=1; imm=('bt',bt)
            else: imm=('bt_type', r.i32())  # s33 type index
        elif op in (0x0c,0x0d): imm=r.u32()
        elif op==0x0e:
            n=r.u32(); imm=[r.u32() for _ in range(n)]+[r.u32()]
        elif op==0x10: imm=r.u32()
        elif op==0x11: imm=(r.u32(), r.u32())
        elif op in (0x20,0x21,0x22,0x23,0x24): imm=r.u32()
        elif 0x28<=op<=0x3e: imm=(r.u32(), r.u32())  # align, offset
        elif op in (0x3f,0x40): imm=r.byte()
        elif op==0x41: imm=r.i32()
        elif op==0x42: imm=r.i64()
        elif op==0x43: imm=r.f32()
        elif op==0x44: imm=r.f64()
        elif op==0xfc:
            sub=r.u32(); imm=sub
            if sub in (0,1,2,3,4,5,6,7): pass  # sat trunc
            elif sub==8: imm=(8,r.u32(),r.byte())   # memory.init
            elif sub==9: imm=(9,r.u32())            # data.drop
            elif sub==10: imm=(10,r.byte(),r.byte()) # memory.copy
            elif sub==11: imm=(11,r.byte())          # memory.fill
            elif sub in (12,13,14,15,16,17): raise Exception('table ops %d'%sub)
            op=(0xfc,sub if isinstance(imm,int) else imm[0])
        elif op==0xfd:
            raise Exception('SIMD op at %d in func %d'%(at,fidx))
        ops.append((at,op,imm))
        if emit: emit(at,op,imm)
    return ops

if __name__=='__main__':
    mod = Module('/root/reference/wasm_function.wasm')
    census = collections.Counter()
    for i in range(len(mod.codes)):
        try:
            for at,op,imm in walk_ops(mod,i):
                census[op if not isinstance(op,tuple) else ('fc',op[1])]+=1
        except Exception as ex:
            print('func',i,'FAILED:',ex); raise
    print('distinct opcodes:', len(census))
    for op,c in sorted(census.items(), key=lambda x:-x[1]):
        print(hex(op) if isinstance(op,int) else op, c)
