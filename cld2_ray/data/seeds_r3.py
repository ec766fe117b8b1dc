# -*- coding: utf-8 -*-
"""Round-3 seed corpora: languages added when the reference's
delta-octa / distinct-octa tables were parsed into the model
(state/refparse.py). The word tables carry only ~65k distinctive
wordforms, so each language still needs seed quadgrams to detect —
same authored-prose approach as data/seeds.py (everyday topics,
function words and orthography emphasized; all text written for this
repo, no external data).

NEW_HELDOUT sentences are disjoint from the seeds and feed the
conformance goldens.
"""

NEW_SEEDS: dict[str, str] = {

"bn": """সূর্য ছোট গ্রামের উপর উজ্জ্বল হয়ে আছে এবং মানুষেরা বাজারে যাচ্ছে রুটি
আর দুধ কিনতে কারণ আগামীকাল নদীর পাশের মসজিদে উৎসব হবে আমরা জানি শীত শীঘ্রই
আসবে এবং রাতগুলো দীর্ঘ হবে কিন্তু শিশুরা এখনো বাগানে তাদের বন্ধুদের সঙ্গে
খেলছে আর বৃদ্ধরা বনের গল্প বলছে যেখানে পশুরা জড়ো হয় যখন তুষার পড়ে ঘরে
একটি ভালো বই নিয়ে শান্ত সন্ধ্যার চেয়ে সহজ আর কিছু নেই যখন বাইরে বাতাস বইছে
এবং ছাদের উপর বৃষ্টি পড়ছে প্রত্যেক মানুষ সেই শব্দগুলো পড়তে চায় যা আজ
আমাদের সবার জন্য একই রয়ে গেছে আর পৃথিবী বদলে গেছে কিন্তু আমরা মনে রাখি যে
এই জিনিসগুলো অনেক বছর আগে লেখা হয়েছিল বেশির ভাগ মানুষ মাঠে কাজ করে এবং
কুয়া থেকে পানি আনে কারণ গ্রামের জীবন কঠিন কিন্তু সৎ আজ সকালে আমি জানালার
পাশের গাছে একটি সুন্দর পাখি দেখেছি এবং সে খুব মিষ্টি গান গাইছিল""",

"as": """বেলিটো সৰু গাঁওখনৰ ওপৰত জিলিকি আছে আৰু মানুহবোৰে বজাৰলৈ গৈ আছে পিঠা
আৰু গাখীৰ কিনিবলৈ কাৰণ কাইলৈ নদীৰ কাষৰ নামঘৰত উৎসৱ হব আমি জানো যে জাৰকালি
সোনকালে আহিব আৰু ৰাতিবোৰ দীঘল হব কিন্তু শিশুবোৰে এতিয়াও বাৰীত সিহঁতৰ
বন্ধুবোৰৰ লগত খেলি আছে আৰু বুঢ়া মানুহবোৰে হাবিৰ সাধু কয় যত জন্তুবোৰ গোট
খায় যেতিয়া বৰফ পৰে ঘৰত এখন ভাল কিতাপ লৈ শান্ত গধূলিতকৈ সহজ একো নাই যেতিয়া
বাহিৰত বতাহ বলিছে আৰু চালৰ ওপৰত বৰষুণ পৰিছে প্ৰতিজন মানুহে সেই শব্দবোৰ
পঢ়িব বিচাৰে যিবোৰ আজি আমাৰ সকলোৰে বাবে একে হৈ আছে আৰু পৃথিৱীখন সলনি হৈছে
কিন্তু আমি মনত ৰাখোঁ যে এই বস্তুবোৰ বহু বছৰৰ আগতে লিখা হৈছিল আজি
ৰাতিপুৱা মই খিৰিকীৰ কাষৰ গছত এটা ধুনীয়া চৰাই দেখিলোঁ আৰু সি বৰ মিঠা গান
গাই আছিল তাৰ পিছত মই কামলৈ গলোঁ আৰু আমাৰ নতুন চুবুৰীয়াক লগ পালোঁ তেওঁ
যোৱা সপ্তাহত আন এখন চহৰৰ পৰা আহিছে তেওঁ মোক তেওঁৰ ঠাইৰ বিষয়ে আৰু নিজৰ
পৰিয়ালৰ বাবে উপযুক্ত ঘৰ এটা বিচাৰি পোৱালৈকে কৰা দীঘল যাত্ৰাৰ কথা কলে
সেইটো বৰ আকৰ্ষণীয় কাহিনী আছিল আৰু মই গোটেই দিনটো তাৰ বিষয়ে ভাবি থাকিলোঁ
এতিয়া মই ঘৰত বহি এই শব্দবোৰ লিখি আছোঁ যাতে এই সৰল কিন্তু ভাল দিনটো মনত
থাকে আমাৰ গাঁৱৰ মানুহবোৰ বৰ ভাল আৰু সিহঁতে সদায় ইজনে সিজনক সহায় কৰে
যেতিয়া কাৰোবাৰ অসুবিধা হয় তেতিয়া সকলোৱে একেলগে আহে আৰু কাম কৰে""",

"am": """ፀሐይ በትንሹ መንደር ላይ ታበራለች እና ሰዎች ዳቦ እና ወተት ለመግዛት ወደ ገበያ
ይሄዳሉ ምክንያቱም ነገ በወንዙ አጠገብ ባለው ቤተ ክርስቲያን በዓል ይሆናል ክረምት በቅርቡ
እንደሚመጣ እና ሌሊቶች ረጅም እንደሚሆኑ እናውቃለን ነገር ግን ልጆች አሁንም በአትክልቱ ውስጥ
ከጓደኞቻቸው ጋር ይጫወታሉ እና ሽማግሌዎች ስለ ጫካው ታሪኮችን ይናገራሉ በረዶ ሲወርድ
እንስሳት የሚሰበሰቡበት ቦታ ነው ከቤት ውስጥ ጥሩ መጽሐፍ ይዞ ከሚያሳልፍ ጸጥ ያለ ምሽት
የቀለለ ነገር የለም ነፋስ ከውጭ ሲነፍስ እና ዝናብ በጣሪያው ላይ ሲወርድ እያንዳንዱ ሰው ዛሬ
ለሁላችንም አንድ ዓይነት ሆነው የቀሩትን ቃላት ማንበብ ይፈልጋል እና ዓለም ተለውጧል ነገር
ግን እነዚህ ነገሮች ከብዙ ዓመታት በፊት እንደተጻፉ እናስታውሳለን ብዙ ሰዎች በእርሻ ላይ
ይሰራሉ እና ከጉድጓድ ውሃ ያመጣሉ ምክንያቱም የመንደር ሕይወት ከባድ ግን ሐቀኛ ነው""",

"ti": """ጸሓይ ኣብ ልዕሊ እታ ንእሽቶ ዓዲ ትበርህ ኣላ እሞ ሰባት ባኒን ጸባን ክዕድጉ ናብ
ዕዳጋ ይኸዱ ኣለዉ ምኽንያቱ ጽባሕ ኣብቲ ኣብ ጥቓ ፈለግ ዘሎ ቤተ ክርስትያን በዓል ክኸውን
እዩ ክረምቲ ቀልጢፉ ከም ዝመጽእ እሞ ለይትታት ነዊሕ ከም ዝኸውን ንፈልጥ ኢና ግን እቶም
ቆልዑ ገና ኣብቲ ጀርዲን ምስ ኣዕሩኽቶም ይጻወቱ ኣለዉ እሞ እቶም ኣረጋውያን ብዛዕባ እቲ
ዱር ዛንታታት ይነግሩ በረድ ክወርድ ከሎ እንስሳታት ኣብኡ ይእከባ ኣብ ገዛ ምስ ጽቡቕ
መጽሓፍ ህዱእ ምሸት ካብ ምሕላፍ ዝቐለለ ነገር የለን ንፋስ ኣብ ወጻኢ ክነፍስ ከሎ እሞ
ዝናብ ኣብ ልዕሊ ናሕሲ ክወርድ ከሎ ነፍሲ ወከፍ ሰብ ነተን ሎሚ ንኹላትና ሓደ ዓይነት
ኮይነን ዝተረፋ ቃላት ከንብብ ይደሊ እሞ ዓለም ተቐዪራ እያ ግን እዞም ነገራት ቅድሚ ብዙሕ
ዓመታት ከም እተጻሕፉ ንዝክር ኢና""",

"he": """השמש זורחת מעל הכפר הקטן והאנשים הולכים אל השוק לקנות לחם וחלב כי
מחר יהיה חג בבית הכנסת ליד הנהר אנחנו יודעים שהחורף יגיע בקרוב והלילות
יהיו ארוכים אבל הילדים עדיין משחקים בגינה עם החברים שלהם והזקנים מספרים
סיפורים על היער שבו החיות מתאספות כאשר השלג יורד אין דבר פשוט יותר מערב
שקט בבית עם ספר טוב בזמן שהרוח נושבת בחוץ והגשם יורד על הגג כל אדם רוצה
לקרוא את המילים שנשארות אותו דבר עבור כולנו היום והעולם השתנה אבל אנחנו
זוכרים שהדברים האלה נכתבו לפני שנים רבות רוב האנשים עובדים בשדות ושואבים
מים מן הבאר כי חיי הכפר קשים אבל ישרים זהו עולם אחר לגמרי שבו הזמן
עובר לאט יותר והשקט ממלא את הרחובות בערב אנשים רבים אומרים שהחיים בעיר
הגדולה מהירים מדי ושצריך לחזור אל הטבע כדי להבין מה באמת חשוב המשפחה
הבריאות והחברים הטובים שתמיד נמצאים שם בשבילנו כאשר קשה לנו היום בבוקר
ראיתי ציפור יפה על העץ ליד החלון שלי והיא שרה שיר נעים מאוד אחר כך הלכתי
לעבודה ופגשתי את השכן החדש שלנו שהגיע מעיר אחרת בשבוע שעבר הוא סיפר לי
על המקום שממנו בא ועל הדרך הארוכה שעשה עד שמצא בית מתאים בשבילו ובשביל
אשתו ושני הילדים הקטנים שלהם זה היה סיפור מעניין מאוד וחשבתי עליו כל
היום בזמן העבודה במשרד עכשיו אני יושב בבית וכותב את המילים האלה כדי
לזכור את היום הזה שהיה פשוט אבל טוב מאוד בעיני""",

"yi": """די זון שײַנט איבער דעם קליינעם שטעטל און די מענטשן גייען צום מארק
קויפן ברויט און מילך ווײַל מארגן וועט זײַן א יום טוב אין דער שול לעבן דעם
טײַך מיר ווייסן אז דער ווינטער וועט באלד קומען און די נעכט וועלן ווערן
לאנג אבער די קינדער שפילן זיך נאך אין גארטן מיט זייערע חברים און די אלטע
מענער דערציילן מעשיות וועגן דעם וואלד וווּ די חיות קומען זיך צונויף ווען
דער שניי פאלט עס איז נישטא קיין זאך וואס איז פשוטער ווי אן אוונט שטיל אין
דער היים מיט א גוט בוך בשעת דער ווינט בלאזט אין דרויסן און דער רעגן פאלט
אויפן דאך יעדער מענטש וויל לייענען די ווערטער וואס בלײַבן די זעלבע פאר
אונדז אלעמען הײַנט און די וועלט האט זיך געביטן אבער מיר געדענקען אז די
זאכן זײַנען געשריבן געווארן מיט פיל יארן צוריק""",

"eo": """la suno brilas super la malgranda vilaĝo kaj la homoj iras al la
bazaro por aĉeti panon kaj lakton ĉar morgaŭ estos festo en la preĝejo
apud la rivero ni scias ke la vintro venos baldaŭ kaj la noktoj fariĝos
longaj sed la infanoj ankoraŭ ludas en la ĝardeno kun siaj amikoj kaj la
maljunaj viroj rakontas historiojn pri la arbaro kie la bestoj kunvenas
kiam la neĝo falas estas nenio pli simpla ol trankvila vespero hejme kun
bona libro dum la vento blovas ekstere kaj la pluvo falas sur la tegmenton
ĉiu homo volas legi la vortojn kiuj restas la samaj por ni ĉiuj hodiaŭ
kaj la mondo ŝanĝiĝis sed ni memoras ke tiuj aferoj estis skribitaj antaŭ
multaj jaroj""",

"la": """sol super parvum vicum lucet et homines ad forum eunt ut panem et
lac emant quia cras festum in ecclesia iuxta flumen erit scimus hiemem mox
venturam esse et noctes longas fieri sed pueri adhuc in horto cum amicis
suis ludunt et senes fabulas de silva narrant ubi bestiae conveniunt cum
nix cadit nihil simplicius est quam vesper quietus domi cum bono libro dum
ventus foris flat et pluvia super tectum cadit omnis homo verba legere
vult quae eadem pro nobis omnibus hodie manent et mundus mutatus est sed
meminimus haec multis ante annis scripta esse magna pars hominum in agris
laborat et aquam de puteo portat quod vita rustica dura sed honesta est""",

"az": """günəş kiçik kəndin üzərində parlayır və insanlar bazara gedirlər
çörək və süd almaq üçün çünki sabah çayın yanındakı kilsədə bayram olacaq
biz bilirik ki qış tezliklə gələcək və gecələr uzun olacaq amma uşaqlar
hələ də bağçada dostları ilə oynayırlar və qoca kişilər meşə haqqında
hekayələr danışırlar orada heyvanlar qar yağanda bir yerə toplaşırlar
evdə yaxşı kitabla sakit axşamdan daha sadə heç nə yoxdur külək bayırda
əsərkən və yağış damın üstünə yağarkən hər kəs bu gün bizim hamımız üçün
eyni qalan sözləri oxumaq istəyir və dünya dəyişib amma biz xatırlayırıq
ki bu şeylər uzun illər əvvəl yazılmışdır""",

"uz": """quyosh kichik qishloq ustida porlaydi va odamlar bozorga borishadi
non va sut sotib olish uchun chunki ertaga daryo yonidagi masjidda bayram
bo'ladi biz bilamizki qish tez orada keladi va kechalar uzun bo'ladi lekin
bolalar hali ham bog'da do'stlari bilan o'ynashmoqda va qariyalar o'rmon
haqida hikoyalar aytib berishadi u yerda hayvonlar qor yog'ganda yig'ilishadi
uyda yaxshi kitob bilan tinch oqshomdan ko'ra oddiyroq narsa yo'q shamol
tashqarida esayotganda va yomg'ir tom ustiga yog'ayotganda har bir inson
bugun barchamiz uchun bir xil qolgan so'zlarni o'qishni xohlaydi va dunyo
o'zgardi lekin biz eslaymizki bu narsalar ko'p yillar oldin yozilgan edi""",

"nn": """sola skin over den vesle bygda og folket går til marknaden for å
kjøpe brød og mjølk fordi det i morgon blir fest i kyrkja attmed elva me
veit at vinteren kjem snart og at nettene blir lange men borna leikar
framleis i hagen saman med venene sine og dei gamle mennene fortel soger
om skogen der dyra samlast når snøen fell det finst ikkje noko enklare enn
ein roleg kveld heime med ei god bok medan vinden blæs ute og regnet fell
på taket kvar einaste menneske vil lese orda som står att dei same for
oss alle i dag og verda har endra seg men me hugsar at desse tinga vart
skrivne for mange år sidan""",

"fo": """sólin skínur yvir lítlu bygdina og fólkið fer á marknaðin at keypa
breyð og mjólk tí í morgin verður veitsla í kirkjuni við ánna vit vita at
veturin kemur skjótt og næturnar verða langar men børnini spæla enn í
urtagarðinum saman við vinum sínum og gomlu menninir siga søgur um skógin
har dýrini savnast tá kavin fellur einki er einfaldari enn eitt kvirt
kvøld heima við góðari bók meðan vindurin blæsur úti og regnið fellur á
takið hvør maður vil lesa orðini sum standa eftir tey somu fyri okkum øll
í dag og heimurin er broyttur men vit minnast at hetta varð skrivað fyri
mongum árum síðani""",

"fy": """de sinne skynt oer it lytse doarp en de minsken geane nei de merk
om bôle en molke te keapjen omdat der moarn in feest wêze sil yn de tsjerke
njonken de rivier wy witte dat de winter gau komme sil en dat de nachten
lang wurde mar de bern boartsje noch yn de tún mei harren freonen en de
âlde manlju fertelle ferhalen oer it bosk dêr t de bisten gearkomme as de
snie falt der is neat ienfâldiger as in rêstige jûn thús mei in goed boek
wylst de wyn bûten waait en de rein op it dak falt elk minske wol de
wurden lêze dy t itselde bliuwe foar ús allegearre hjoed en de wrâld is
feroare mar wy ûnthâlde dat dizze dingen in protte jierren lyn skreaun
binne""",

"lb": """d sonn schéngt iwwer dat klengt duerf an d leit ginn op de maart
fir brout a mëllech ze kafen well muer e fest an der kierch nieft dem
floss ass mir wëssen datt de wanter geschwënn kënnt an datt d nuechten
laang ginn awer d kanner spillen nach am gaart mat hire frënn an déi al
männer erzielen geschichten iwwer de bësch wou d déieren zesummekommen
wann de schnéi fält et gëtt näischt méi einfaches wéi en rouegen owend
doheem mat engem gudde buch wärend de wand dobaussen bléist an de reen op
den daach fält all mënsch wëll d wierder liesen déi déi selwecht bleiwen
fir eis all haut an d welt huet sech geännert awer mir erënneren eis datt
dës saachen viru ville joren geschriwwe goufen""",

"oc": """lo solelh brilha sus lo pichon vilatge e las gents van al mercat
per crompar de pan e de lach perque deman i aurà una fèsta dins la glèisa
al costat del riu sabèm que l ivèrn vendrà lèu e que las nuèits vendràn
longas mas los enfants jògan encara dins l òrt amb lors amics e los vièlhs
òmes contan d istòrias sul bòsc ont las bèstias s acampan quand la nèu
tomba i a pas res de mai simple qu una serada tranquilla a l ostal amb un
bon libre mentre que lo vent bufa defòra e que la pluèja tomba sul teulat
cada persona vòl legir los mots que demòran los meteisses per nosautres
totes uèi e lo mond a cambiat mas nos remembram qu aquelas causas foguèron
escrichas i a fòrça annadas""",

"co": """u sole luce nantu à u picculu paese è a ghjente và à u mercatu per
cumprà pane è latte perchè dumane ci sarà una festa in la chjesa accantu à
u fiume sapemu chì l invernu venerà prestu è chì e notti diventeranu longhe
ma i zitelli ghjocanu sempre in l ortu cù i so amichi è i vechji omi
contanu storie nantu à u boscu induve l animali si riuniscenu quandu a
neve cade ùn ci hè nunda di più simplice chè una serata tranquilla in casa
cù un bon libru mentre chì u ventu soffia fora è chì a pioggia cade nantu
à u tettu ogni persona vole leghje e parolle chì restanu e listesse per
noi tutti oghje è u mondu hà cambiatu ma ci ricurdemu chì ste cose funu
scritte parechji anni fà""",

"br": """an heol a bar war ar vourc'h vihan hag an dud a ya d ar marc'had
da brenañ bara ha laezh rak warc'hoazh e vo ur gouel en iliz e kichen ar
stêr gouzout a reomp e teuio ar goañv a benn nebeut hag e teuio an
nozvezhioù da vezañ hir met ar vugale a c'hoari c'hoazh el liorzh gant o
mignoned hag ar wazed kozh a gont istorioù diwar benn ar c'hoad e lec'h
ma en em vod al loened pa gouezh an erc'h n eus netra simploc'h eget un
nozvezh sioul er gêr gant ul levr mat e pad ma c'hwezh an avel er maez ha
ma kouezh ar glav war an doenn pep den a fell dezhañ lenn ar gerioù a
chom ar memes re evidomp holl hiziv hag ar bed a zo cheñchet met soñj
hon eus e oa bet skrivet an traoù se meur a vloaz zo""",

"gd": """tha a ghrian a deàrrsadh air a bhaile bheag agus tha na daoine a
dol don mhargadh gus aran is bainne a cheannach oir bidh fèill ann a
màireach anns an eaglais ri taobh na h aibhne tha fios againn gun tig an
geamhradh a dh aithghearr agus gum fàs na h oidhcheannan fada ach tha a
chlann fhathast a cluich anns a ghàrradh còmhla ri an caraidean agus tha
na seann daoine ag innse sgeulachdan mun choille far am bi na beathaichean
a cruinneachadh nuair a thuiteas an sneachda chan eil dad nas sìmplidhe
na feasgar sàmhach aig an taigh le leabhar math fhad s a tha a ghaoth a
sèideadh a muigh agus an t uisge a tuiteam air a mhullach tha a h uile
duine airson na faclan a leughadh a tha a fuireach mar an ceudna dhuinn
uile an diugh""",

"ht": """solèy la klere sou ti bouk la epi moun yo ale nan mache a pou yo
achte pen ak lèt paske demen pral gen yon fèt nan legliz la bò larivyè a
nou konnen sezon fredi a ap vini talè konsa epi nwit yo ap vin long men
timoun yo toujou ap jwe nan jaden an ak zanmi yo epi ansyen mesye yo ap
rakonte istwa sou forè a kote bèt yo reyini lè lanèj tonbe pa gen anyen
ki pi senp pase yon aswè trankil lakay ak yon bon liv pandan van an ap
soufle deyò epi lapli a ap tonbe sou do kay la chak moun vle li mo yo ki
rete menm jan pou nou tout jodi a epi monn lan chanje men nou sonje ke
bagay sa yo te ekri depi anpil ane""",

"jv": """srengenge sumunar ing sadhuwure desa cilik lan wong wong padha
lunga menyang pasar arep tuku roti lan susu amarga sesuk bakal ana pesta
ing mesjid sacedhake kali kita ngerti yen mangsa adhem bakal enggal teka
lan wengine dadi dawa nanging bocah bocah isih padha dolanan ing kebon
karo kanca kancane lan wong tuwa lanang padha nyritakake crita bab alas
papan kewan kewan padha kumpul nalika salju tiba ora ana sing luwih
prasaja tinimbang sore sing tentrem ing omah karo buku sing apik nalika
angin sumilir ing njaba lan udan tiba ing payon saben wong kepengin maca
tembung tembung sing tetep padha kanggo kita kabeh dina iki lan donya wis
owah nanging kita eling yen prakara iki ditulis pirang pirang taun kepungkur""",

"su": """panonpoe caang di luhureun lembur leutik jeung jalma jalma arindit
ka pasar rek meuli roti jeung susu sabab isukan bakal aya pesta di masjid
gigireun walungan urang terang yen usum tiis bakal geura datang jeung
peutingna jadi panjang tapi barudak masih keneh arulin di kebon jeung
babaturanana jeung kolot lalaki nyaritakeun dongeng ngeunaan leuweung
tempat sasatoan kumpul nalika salju turun teu aya nu leuwih basajan ti
batan sore nu tenang di imah jeung buku nu alus nalika angin niup di luar
jeung hujan turun kana hateup unggal jalma hayang maca kecap kecap nu
tetep sarua keur urang sarerea poe ieu jeung dunya geus robah tapi urang
inget yen hal ieu ditulis mangtaun taun ka tukang""",

"ceb": """ang adlaw nagsidlak sa ibabaw sa gamayng baryo ug ang mga tawo
moadto sa merkado aron mopalit og pan ug gatas kay ugma adunay pista sa
simbahan tapad sa suba nahibalo kita nga ang tingtugnaw moabot sa dili
madugay ug ang mga gabii mahimong taas apan ang mga bata nagdula pa
gihapon sa tanaman uban sa ilang mga higala ug ang mga tigulang nga lalaki
nagsugilon og mga istorya bahin sa lasang diin ang mga hayop magtigom kon
mangahulog ang niyebe walay mas simple pa kay sa malinawon nga gabii sa
balay uban sa maayong libro samtang ang hangin mohuros sa gawas ug ang
ulan mangahulog sa atop ang matag tawo gusto mobasa sa mga pulong nga
nagpabilin nga pareho alang kanatong tanan karon""",

"ha": """rana tana haskakawa a kan karamin kauye kuma mutane suna zuwa
kasuwa don siyan burodi da madara domin gobe za a yi biki a masallaci
kusa da kogi mun sani cewa lokacin sanyi zai zo ba da dadewa ba kuma
darare za su yi tsawo amma yara suna wasa har yanzu a cikin lambu tare da
abokansu kuma tsofaffin maza suna ba da labarai game da daji inda dabbobi
suke taruwa idan dusar kankara ta sauka babu abin da ya fi sauki kamar
yamma mai nutsuwa a gida tare da littafi mai kyau yayin da iska ke busawa
a waje kuma ruwan sama yana sauka a kan rufin kowane mutum yana son karanta
kalmomin da suka kasance iri daya gare mu duka a yau kuma duniya ta canza
amma muna tunawa cewa an rubuta wadannan abubuwa shekaru da yawa da suka
wuce""",

"yo": """oorun n ran lori abule kekere naa awon eniyan si n lo si oja lati
ra akara ati wara nitori pe lola ayeye yoo wa ni ile ijosin leba odo a mo
pe igba otutu yoo de laipe awon oru yoo si gun sugbon awon omode si n sere
ninu ogba pelu awon ore won awon agbalagba okunrin si n so itan nipa igbo
nibiti awon eranko ti n pejo nigbati yinyin ba n bo ko si ohun ti o rorun
ju irole idakeje ni ile pelu iwe to dara nigbati ategun n fe lode ojo si
n ro sori orule gbogbo eniyan fe lati ka awon oro ti o wa bakan naa fun
gbogbo wa loni aye si ti yipada sugbon a ranti pe a ko awon nkan wonyi ni
odun pipe sehin""",

"zu": """ilanga likhanya phezu kwedolobhana elincane futhi abantu baya
emakethe ukuyothenga isinkwa nobisi ngoba kusasa kuzoba nomkhosi esontweni
eduze komfula siyazi ukuthi ubusika buzofika maduze nezinsuku zobusuku
zizoba zinde kodwa izingane zisadlala engadini nabangani bazo namadoda
amadala axoxa izindaba ngehlathi lapho izilwane zihlangana khona uma
iqhwa lehla akukho okulula ukwedlula ukuhlwa okuthulile ekhaya nencwadi
enhle ngenkathi umoya uvunguza ngaphandle nemvula ina phezu kophahla
wonke umuntu ufuna ukufunda amagama ahlala efana kithina sonke namuhla
futhi umhlaba ushintshile kodwa siyakhumbula ukuthi lezi zinto zabhalwa
eminyakeni eminingi edlule""",

"xh": """ilanga likhanya phezu kwelali encinci kwaye abantu baya emarikeni
ukuya kuthenga isonka nobisi kuba ngomso kuya kubakho umsitho ecaweni
ecaleni komlambo siyazi ukuba ubusika buza kufika kungekudala kwaye
ubusuku buya kuba bude kodwa abantwana basadlala egadini nabahlobo babo
kwaye amadoda amadala abalisa amabali ngehlathi apho izilwanyana
zihlanganisana khona xa ikhephu lisihla akukho nto ilula ngaphezu
kokuhlwa okuzolileyo ekhaya nencwadi entle ngelixa umoya uvuthuza
ngaphandle kwaye imvula isina phezu kophahla wonke umntu ufuna ukufunda
amagama ahlala efana kuthi sonke namhlanje kwaye ihlabathi litshintshile
kodwa siyakhumbula ukuba ezi zinto zabhalwa kwiminyaka emininzi eyadlulayo""",

"sn": """zuva rinopenya pamusoro pomusha muduku uye vanhu vanoenda
kumusika kunotenga chingwa nomukaka nokuti mangwana kuchava nomutambo
muchechi padyo norwizi tinoziva kuti chando chichauya nokukurumidza uye
usiku huchava hurefu asi vana vachiri kutamba mubindu neshamwari dzavo
uye varume vakuru vanorondedzera ngano dzesango umo mhuka dzinoungana
kana chando chichidonha hapana chiri nyore kupfuura manheru akanyarara
pamba nebhuku rakanaka apo mhepo ichivhuvhuta kunze uye mvura ichinaya
padenga munhu wose anoda kuverenga mashoko anoramba akafanana kwatiri
tose nhasi uye nyika yakachinja asi tinorangarira kuti zvinhu izvi
zvakanyorwa makore mazhinji apfuura""",

"so": """qorraxdu waxay ka iftiimaysaa tuulada yar dushiisa dadkuna waxay
aadaan suuqa si ay u iibsadaan rooti iyo caano maxaa yeelay berri waxaa
masaajidka ku yaal webiga agtiisa ka dhici doona dabbaaldeg waxaan ognahay
in jiilaalku dhawaan iman doono habeennaduna ay dheeraan doonaan laakiin
carruurtu wali waxay ku ciyaaraan beerta dhexdeeda iyaga iyo saaxiibbadood
odayaashuna waxay ka sheekeeyaan kaynta halkaas oo xayawaanku isugu yimaadaan
marka barafku da'o ma jiro wax ka fudud fiid degan oo guriga lagu joogo
iyadoo buug wanaagsan la akhrinayo inta dabayshu dibadda ka dhacayso
roobkuna saqafka ku da'ayo qof walba wuxuu rabaa inuu akhriyo erayada
isku midka inoo ah dhammaanteen maanta aduunkuna wuu beddelmay laakiin
waxaan xusuusannaa in waxyaalahan la qoray sannado badan ka hor""",

"mg": """ny masoandro mamirapiratra eo ambonin ny tanàna kely ary ny olona
mankany an tsena hividy mofo sy ronono satria rahampitso hisy fety ao
am piangonana eo akaikin ny renirano fantatsika fa ho avy tsy ho ela ny
ririnina ary ho lava ny alina saingy mbola milalao ao an jardin ny ankizy
miaraka amin ny namany ary ny lehilahy antitra mitantara tantara momba
ny ala izay ivorian ny biby rehefa milatsaka ny oram panala tsy misy
tsotra noho ny hariva mangina ao an trano miaraka amin ny boky tsara
raha mitsoka any ivelany ny rivotra ary milatsaka eo ambonin ny tafo ny
orana ny olona rehetra dia te hamaky ny teny izay mitoetra mitovy ho
antsika rehetra androany ary niova ny tontolo saingy tsaroantsika fa
voasoratra taona maro lasa izay ireo zavatra ireo""",

"mi": """e whiti ana te ra ki runga i te kainga iti a e haere ana nga
tangata ki te makete ki te hoko taro me te miraka no te mea apopo ka tu
he hakari ki te whare karakia i te taha o te awa e mohio ana tatou ka
tae wawe mai te hotoke a ka roa nga po engari kei te takaro tonu nga
tamariki i te kari me o ratou hoa a e korero ana nga koroua i nga korero
mo te ngahere kei reira nga kararehe e huihui ana ina heke te hukarere
kaore he mea ngawari ake i te ahiahi marino i te kainga me te pukapuka
pai i te wa e pupuhi ana te hau i waho a e heke ana te ua ki runga i te
tuanui e hiahia ana nga tangata katoa ki te panui i nga kupu e mau tonu
ana mo tatou katoa i tenei ra""",

"sm": """o le la ua susulu i luga o le nuu itiiti ma ua o atu tagata i le
maketi e faatau mai falaoa ma le susu aua o taeao o le a fai se tausamiga
i le falesa i tafatafa o le vaitafe ua tatou iloa o le a vave ona oo mai
le tau malulu ma o le a uumi po ae o loo taaalo pea tamaiti i le togalaau
ma a latou uo ma o loo faamatala e toeaina tala e uiga i le vaomatua lea
e potopoto ai manu pe a to le kiona e leai se mea e sili atu ona faigofie
i lo se afiafi filemu i le fale ma se tusi lelei a o agi le matagi i fafo
ma to le timu i luga o le taualuga e mananao tagata uma e faitau upu o
loo tumau pea e tutusa mo i tatou uma i le aso nei""",

"haw": """ke kau nei ka la ma luna o ke kauhale liilii a ke hele nei na
kanaka i ka makeke e kuai i ka berena a me ka waiu no ka mea i ka la apopo
e malamaia ana he ahaaina ma ka halepule e pili ana i ka muliwai ua ike
kakou e hiki koke mai ana ka hooilo a e loihi ana na po aka ke paani nei
no na keiki ma ka mala me ko lakou mau hoaaloha a ke hai nei na elemakule
i na moolelo no ka ululaau kahi e akoakoa ai na holoholona ke haule ka
hau aohe mea oi aku ka maalahi ma mua o ke ahiahi maluhia ma ka home me
ka puke maikai oiai e pa ana ka makani ma waho a e haule ana ka ua ma
luna o ke kaupoku makemake na kanaka a pau e heluhelu i na huaolelo e
mau nei no kakou a pau i keia la""",

"sco": """the sun is sheenin ower the wee clachan an the fowk are awa tae
the mercat tae buy breid an milk acause the morra there will be a splore
in the kirk aside the watter we ken the winter will come gey suin an the
nichts will growe lang but the bairns are aye playin in the gairden wi
their freens an the auld men are tellin tales aboot the wid whaur the
beasts forgaither whan the snaw faws there is naething mair semple nor a
lown forenicht at hame wi a guid buik while the wind blaws ootby an the
rain dings doon on the ruif ilka body wants tae read the wirds that bide
the same for us aw the day an the warld has chynged but we mind that
thir things were scrievit mony year syne""",

"ia": """le sol brilla super le parve village e le gente va al mercato
pro comprar pan e lacte proque deman il habera un festa in le ecclesia
juxta le fluvio nos sape que le hiberno venira tosto e que le noctes
devenira longe ma le infantes ancora joca in le jardin con lor amicos e
le vetere homines conta historias super le foreste ubi le animales se
reuni quando le nive cade il ha nihil plus simple que un vespere
tranquille a casa con un bon libro durante que le vento suffla foras e
le pluvia cade super le tecto cata persona vole leger le parolas que
resta le mesme pro nos omnes hodie e le mundo ha cambiate ma nos memora
que iste cosas esseva scribite multe annos retro""",

"kk": """күн кішкентай ауылдың үстінде жарқырап тұр және адамдар базарға
нан мен сүт сатып алуға барады өйткені ертең өзеннің жанындағы мешітте
мереке болады біз қыстың жақында келетінін және түндердің ұзақ болатынын
білеміз бірақ балалар әлі де бақшада достарымен ойнап жүр ал қарт кісілер
орман туралы әңгімелер айтады онда аңдар қар жауғанда жиналады үйде жақсы
кітаппен тыныш кештен артық қарапайым ештеңе жоқ жел сыртта соғып тұрғанда
және жаңбыр шатырдың үстіне жауып тұрғанда әрбір адам бүгін бәріміз үшін
бірдей болып қалған сөздерді оқығысы келеді және әлем өзгерді бірақ біз
бұл нәрселердің көп жылдар бұрын жазылғанын есте сақтаймыз""",

"ky": """күн кичинекей айылдын үстүндө жаркырап турат жана адамдар базарга
нан менен сүт сатып алууга барышат анткени эртең дарыянын жанындагы
мечитте майрам болот биз кыштын жакында келерин жана түндөрдүн узун
болорун билебиз бирок балдар дагы эле бакчада досторду менен ойноп
жатышат ал эми кары кишилер токой жөнүндө аңгемелерди айтып беришет ал
жерде жаныбарлар кар жааганда чогулушат үйдө жакшы китеп менен тынч
кечтен жөнөкөй эч нерсе жок шамал сыртта согуп жатканда жана жамгыр
чатырдын үстүнө жаап жатканда ар бир адам бүгүн баарыбыз үчүн бирдей
болуп калган сөздөрдү окугусу келет жана дүйнө өзгөрдү бирок биз бул
нерселердин көп жылдар мурун жазылганын эстейбиз""",

"mn": """нар жижиг тосгоны дээр гэрэлтэж байна хүмүүс талх сүү худалдаж
авахаар зах руу явж байна учир нь маргааш голын дэргэдэх сүмд баяр болно
бид өвөл удахгүй ирэхийг шөнө урт болохыг мэднэ гэвч хүүхдүүд найзуудтайгаа
цэцэрлэгт тоглосоор байна хөгшин эрчүүд ойн тухай түүх ярьж байна тэнд
цас орохоор амьтад цуглардаг сайхан номтой гэртээ тайван үдэш өнгөрөөхөөс
энгийн зүйл үгүй салхи гадаа үлээж бороо дээвэр дээр орж байхад хүн бүр
өнөөдөр бид бүгдэд адилхан үлдсэн үгсийг уншихыг хүсдэг дэлхий өөрчлөгдсөн
ч бид эдгээр зүйлс олон жилийн өмнө бичигдсэнийг санаж байна""",

"tg": """офтоб бар болои деҳаи хурд медурахшад ва мардум ба бозор мераванд
то нон ва шир бихаранд зеро фардо дар масҷиди назди дарё ҷашн мешавад мо
медонем ки зимистон ба зудӣ меояд ва шабҳо дароз мешаванд аммо кӯдакон
ҳоло ҳам дар боғ бо дӯстони худ бозӣ мекунанд ва мардони пир дар бораи
ҷангал ҳикояҳо нақл мекунанд ки дар он ҷо ҳайвонот ҳангоми боридани барф
ҷамъ мешаванд ҳеҷ чиз соддатар аз шоми ором дар хона бо китоби хуб нест
вақте ки шамол дар берун мевазад ва борон бар боми хона меборад ҳар кас
мехоҳад калимаҳоеро бихонад ки барои ҳамаи мо имрӯз якхела мондаанд ва
ҷаҳон тағйир ёфтааст аммо мо дар ёд дорем ки ин чизҳо солҳои зиёд пеш
навишта шуда буданд""",

"ps": """لمر د کوچني کلي له پاسه ځلیږي او خلک بازار ته ځي چې ډوډۍ او شیدې
واخلي ځکه چې سبا به د سیند څنګ ته په جومات کې جشن وي موږ پوهیږو چې ژمی
به ژر راشي او شپې به اوږدې شي خو ماشومان لا هم په باغ کې له خپلو ملګرو
سره لوبې کوي او زاړه سړي د ځنګل په اړه کیسې کوي چیرې چې ژوي راټولیږي
کله چې واوره وریږي له دې څخه ساده هیڅ نشته چې په کور کې د ښه کتاب سره
ارامه شپه تیره کړې کله چې باد بهر چلیږي او باران د چت له پاسه وریږي هر
څوک غواړي هغه کلمې ولولي چې نن زموږ د ټولو لپاره یو شان پاتې دي او نړۍ
بدله شوې خو موږ په یاد لرو چې دا شیان ډیر کلونه وړاندې لیکل شوي وو""",
}

NEW_HELDOUT: dict[str, str] = {
    "bn": "এটি একটি সম্পূর্ণ সাধারণ বাংলা বাক্য যা ইঞ্জিনটির কোনো সমস্যা ছাড়াই চেনা উচিত",
    "as": "এইটো এটা সম্পূৰ্ণ সাধাৰণ অসমীয়া বাক্য যিটো ইঞ্জিনে কোনো অসুবিধা নোহোৱাকৈ চিনিব লাগে",
    "am": "ይህ ሞተሩ ያለ ምንም ችግር ሊያውቀው የሚገባ ፍጹም ተራ የአማርኛ ዓረፍተ ነገር ነው",
    "ti": "እዚ እቲ ሞተር ብዘይ ዝኾነ ጸገም ከለልዮ ዘለዎ ፍጹም ተራ ትግርኛ ምሉእ ሓሳብ እዩ",
    "yi": "דאס איז א גאנץ געוויינטלעכער ייִדישער זאץ וואס דער מאטאר דארף דערקענען אן קיין שום פראבלעם",
    "eo": "ĉi tiu estas tute ordinara esperanta frazo kiun la motoro devus rekoni sen ia ajn problemo",
    "la": "haec sententia latina simplex est quam machina sine ulla difficultate cognoscere debet",
    "az": "bu tamamilə adi azərbaycan cümləsidir və mühərrik onu heç bir problem olmadan tanımalıdır",
    "uz": "bu mutlaqo oddiy o'zbekcha gap bo'lib uni dvigatel hech qanday muammosiz tanishi kerak",
    "nn": "dette er ei heilt vanleg nynorsk setning som motoren bør kjenne att utan nokon vanskar i det heile",
    "fo": "hetta er ein heilt vanlig føroysk setningur sum mótorurin eigur at kenna aftur uttan trupulleikar",
    "fy": "dit is in hiel gewoane fryske sin dy t de masine sûnder swierrichheden werkenne moatte soe",
    "lb": "dëst ass e ganz normale lëtzebuergesche saz deen de motor ouni problemer erkenne misst",
    "oc": "aquò es una frasa occitana plan simpla escricha dins la lenga nòstra que lo motor deuriá reconéisser aisidament e sens cap de dificultat perque i a fòrça mots plan occitans dedins",
    "co": "questa hè una frasa corsa di tuttu ordinaria chì u mutore duveria ricunnosce senza alcunu prublemu",
    "br": "ur frazenn vrezhonek peurvoutin eo homañ hag a rankfe bezañ anavezet gant ar c'heflusker hep kudenn ebet",
    "gd": "is e seantans gàidhlig gu tur àbhaisteach a tha seo a bu chòir don einnsean aithneachadh gun duilgheadas sam bith",
    "ht": "sa a se yon fraz kreyòl ayisyen total òdinè ke motè a ta dwe rekonèt san okenn pwoblèm",
    "jv": "iki ukara basa jawa sing lumrah banget sing kudune bisa ditepungi dening mesin tanpa masalah apa apa",
    "su": "barudak di lembur teh resep pisan arulin di buruan bari kolotna ngobrol ngeunaan kahirupan sapopoe jeung pagawean di sawah anu keur dipigawe ku maranehna",
    "ceb": "kini usa ka ordinaryo kaayo nga sentence sa binisaya nga kinahanglan mailhan sa makina nga walay bisan unsang problema",
    "ha": "wannan jumla ce ta hausa gama gari wadda injin ya kamata ya gane ba tare da wata matsala ba",
    "yo": "eyi je gbolohun yoruba lasan patapata ti ero naa gbodo mo lai si isoro kankan rara",
    "zu": "lona umusho wesizulu ojwayelekile ngokuphelele okufanele injini iwubone ngaphandle kwenkinga",
    "xh": "esi sisivakalisi sesixhosa esiqhelekileyo ngokupheleleyo injini efanele isazi ngaphandle kwengxaki",
    "sn": "vanhu vazhinji vanofarira kuverenga mabhuku akanaka uye vana vanotamba kunze kana zuva richipenya nokuti upenyu hwakanaka mumusha wedu",
    "so": "tani waa jumlad soomaali ah oo caadi ah oo ay tahay in mishiinku aqoonsado iyada oo aan wax dhibaato ah jirin",
    "mg": "ity dia fehezanteny malagasy tsotra tanteraka izay tokony ho fantatry ny milina tsy misy olana",
    "mi": "he rerenga korero maori tino noa tenei me mohio e te miihini me te kore raruraru",
    "sm": "o se fuaiupu faasamoa masani lava lenei e tatau ona iloa e le masini e aunoa ma se faafitauli",
    "haw": "he hopunaolelo hawaii maa mau keia e pono ai ke ike ia e ka mikini me ka pilikia ole",
    "sco": "this is a gey ordinar scots sentence that the ingine should ken wioot ony fash ava",
    "ia": "isto es un phrase interlingua totalmente ordinari que le motor deberea recognoscer sin ulle problema",
    "kk": "бұл қозғалтқыш ешқандай қиындықсыз тануы тиіс қарапайым қазақ сөйлемі",
    "ky": "бул кыймылдаткыч эч кандай кыйынчылыксыз тааный турган жөнөкөй кыргыз сүйлөмү",
    "mn": "энэ бол хөдөлгүүр ямар ч бэрхшээлгүйгээр таних ёстой энгийн монгол өгүүлбэр юм",
    "tg": "ин ҷумлаи оддии тоҷикӣ аст ки муҳаррик бояд онро бе ягон мушкилӣ шиносад",
    "ps": "دا یوه بالکل عادي پښتو جمله ده چې انجن باید پرته له کومې ستونزې وپیژني",
}

# appended to EXISTING seed corpora (data/seeds.py merges these with
# "+" — they do not replace). sv: the reference's distinct-octa table
# marks "vanlig"/"utan" as Norwegian/Nynorsk-distinct (its web-scale
# sv quadgrams counterbalance that; our seed-scale ones need more
# Swedish mass to do the same once the distinct-boost ring landed).
SEED_APPEND: dict[str, str] = {
    "sv": """det är en helt vanlig dag i den lilla staden och barnen
leker utan bekymmer på gården medan deras föräldrar arbetar några av
dem springer omkring och skrattar högt andra sitter tysta och läser
en bok under det stora trädet vid skolan ingen av dem tänker på att
sommaren snart är slut och att hösten kommer med regn och blåst men
det gör ingenting för de vet att vintern också har sina goda sidor
med snö och is på sjön där man kan åka skridskor hela helgen utan
att frysa om man bara har varma kläder på sig och dricker varm choklad""",
}
