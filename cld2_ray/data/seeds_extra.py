# -*- coding: utf-8 -*-
"""Second seed paragraphs, topically distinct from seeds.py (markets,
cities, cooking, seasons, work), to widen n-gram coverage for the
quadgram-scored languages — especially the statistically-close
clusters {pt,gl,es,ca}, {sv,no,da}, {ru,uk,bg,sr,mk,be}, {cs,sk},
{id,ms}, {ar,fa,ur}. Authored for this repo; no external data."""

EXTRA: dict[str, str] = {

"en": """yesterday morning my sister took the early train to the city where
she works in a small office near the harbour she always buys coffee at the
corner shop before work and reads the news on her phone in the evening we
cooked dinner together rice with fish and green vegetables then we watched
an old film about sailors lost at sea the neighbours came over later to
play cards and talk about their garden which gives them tomatoes beans and
apples every autumn next year they hope to build a small greenhouse so the
plants can grow even during the cold months everyone agrees that spring is
the best season here because the days get longer the trees turn green and
the whole town smells of fresh bread from the bakery on the main square""",

"fr": """hier matin ma sœur a pris le premier train pour la ville où elle
travaille dans un petit bureau près du port elle achète toujours un café au
coin de la rue avant le travail et lit les nouvelles sur son téléphone le
soir nous avons préparé le dîner ensemble du riz avec du poisson et des
légumes verts puis nous avons regardé un vieux film sur des marins perdus
en mer les voisins sont venus plus tard pour jouer aux cartes et parler de
leur jardin qui leur donne des tomates des haricots et des pommes chaque
automne l'année prochaine ils espèrent construire une petite serre pour que
les plantes puissent pousser même pendant les mois froids tout le monde est
d'accord que le printemps est la plus belle saison ici parce que les jours
deviennent plus longs et que toute la ville sent le pain frais""",

"de": """gestern morgen nahm meine schwester den frühen zug in die stadt wo
sie in einem kleinen büro in der nähe des hafens arbeitet sie kauft immer
einen kaffee an der ecke bevor die arbeit beginnt und liest die nachrichten
auf ihrem telefon am abend haben wir zusammen gekocht reis mit fisch und
grünem gemüse danach sahen wir einen alten film über seeleute die auf dem
meer verloren gingen die nachbarn kamen später vorbei um karten zu spielen
und über ihren garten zu sprechen der ihnen jeden herbst tomaten bohnen und
äpfel schenkt nächstes jahr wollen sie ein kleines gewächshaus bauen damit
die pflanzen auch in den kalten monaten wachsen können alle sind sich einig
dass der frühling die schönste jahreszeit ist weil die tage länger werden""",

"es": """ayer por la mañana mi hermana tomó el primer tren a la ciudad donde
trabaja en una oficina pequeña cerca del puerto siempre compra un café en la
esquina antes del trabajo y lee las noticias en su teléfono por la noche
cocinamos juntos arroz con pescado y verduras luego vimos una película
antigua sobre marineros perdidos en el mar los vecinos vinieron después para
jugar a las cartas y hablar de su huerto que les da tomates judías y
manzanas cada otoño el año que viene esperan construir un pequeño
invernadero para que las plantas puedan crecer incluso durante los meses
fríos todos están de acuerdo en que la primavera es la mejor estación aquí
porque los días se alargan los árboles se ponen verdes y toda la ciudad
huele a pan recién hecho desde la panadería de la plaza mayor""",

"it": """ieri mattina mia sorella ha preso il primo treno per la città dove
lavora in un piccolo ufficio vicino al porto compra sempre un caffè
all'angolo prima del lavoro e legge le notizie sul suo telefono la sera
abbiamo cucinato insieme riso con pesce e verdure poi abbiamo guardato un
vecchio film su marinai perduti in mare i vicini sono venuti più tardi per
giocare a carte e parlare del loro orto che regala pomodori fagioli e mele
ogni autunno l'anno prossimo sperano di costruire una piccola serra perché
le piante possano crescere anche durante i mesi freddi tutti sono d'accordo
che la primavera è la stagione più bella qui perché le giornate si
allungano gli alberi diventano verdi e tutta la città profuma di pane""",

"pt": """ontem de manhã a minha irmã apanhou o primeiro comboio para a
cidade onde trabalha num pequeno escritório perto do porto ela compra sempre
um café na esquina antes do trabalho e lê as notícias no telemóvel à noite
cozinhámos juntos arroz com peixe e legumes depois vimos um filme antigo
sobre marinheiros perdidos no mar os vizinhos vieram mais tarde jogar às
cartas e falar da sua horta que lhes dá tomates feijão e maçãs todos os
outonos no próximo ano esperam construir uma pequena estufa para que as
plantas possam crescer mesmo durante os meses frios toda a gente concorda
que a primavera é a melhor estação aqui porque os dias ficam mais longos as
árvores ficam verdes e a cidade inteira cheira a pão acabado de cozer não
há nada como uma tarde de domingo com uma chávena de chá e um livro bom
você sabe que as coisas boas da vida são simples e que a estação das chuvas
também não dura para sempre""",

"gl": """onte pola mañá a miña irmá colleu o primeiro tren cara á cidade
onde traballa nunha pequena oficina preto do porto ela sempre merca un café
na esquina antes do traballo e le as novas no seu móbil pola noite
cociñamos xuntos arroz con peixe e verduras despois vimos unha película
vella sobre mariñeiros perdidos no mar os veciños viñeron máis tarde xogar
ás cartas e falar da súa horta que lles dá tomates fabas e mazás cada outono
para o ano que vén agardan construír un pequeno invernadoiro para que as
plantas poidan medrar mesmo durante os meses fríos todo o mundo está de
acordo en que a primavera é a mellor estación aquí porque os días fanse
máis longos as árbores póñense verdes e toda a cidade cheira a pan feito na
panadería da praza maior non hai nada coma unha tarde con xente amiga""",

"ca": """ahir al matí la meva germana va agafar el primer tren cap a la
ciutat on treballa en una oficina petita a prop del port sempre compra un
cafè a la cantonada abans de la feina i llegeix les notícies al seu mòbil
al vespre vam cuinar junts arròs amb peix i verdures després vam veure una
pel·lícula antiga sobre mariners perduts al mar els veïns van venir més
tard per jugar a cartes i parlar del seu hort que els dóna tomàquets
mongetes i pomes cada tardor l'any que ve esperen construir un petit
hivernacle perquè les plantes puguin créixer fins i tot durant els mesos
freds tothom està d'acord que la primavera és la millor estació aquí
perquè els dies s'allarguen els arbres es tornen verds i tota la ciutat fa
olor de pa acabat de fer des del forn de la plaça major""",

"sv": """igår morse tog min syster det tidiga tåget till staden där hon
arbetar på ett litet kontor nära hamnen hon köper alltid kaffe i hörnet
innan jobbet och läser nyheterna på sin telefon på kvällen lagade vi middag
tillsammans ris med fisk och gröna grönsaker sedan tittade vi på en gammal
film om sjömän som gått vilse på havet grannarna kom över senare för att
spela kort och prata om sin trädgård som ger dem tomater bönor och äpplen
varje höst nästa år hoppas de kunna bygga ett litet växthus så att växterna
kan växa även under de kalla månaderna alla är överens om att våren är den
bästa årstiden här eftersom dagarna blir längre träden blir gröna och hela
staden doftar av färskt bröd från bageriet på stora torget ingenting är
bättre än en söndagseftermiddag med en kopp te och en bra bok i vårt land finns det många vackra städer och byar där
människor bor som älskar sitt hemland varje vår planterar de grönsaker och
på sommaren plockar de bär och svamp i skogen barnen går i skolan och lär
sig läsa och skriva och på kvällen leker de på gården utanför huset mormor
berättar sagor för barnbarnen om katten och tuppen om räven och vargen och
morfar spelar svenska visor på sin fiol när det blir högtid samlas hela
familjen kring bordet där det finns sill potatis och knäckebröd och alla
sjunger tillsammans för sången förenar människor och ger dem kraft att
leva vidare även i svåra tider alla vet att modersmålet är en skatt som
man måste vårda och ge vidare till barn och barnbarn""",

"no": """i går morges tok søsteren min det tidlige toget til byen der hun
jobber på et lite kontor nær havnen hun kjøper alltid kaffe på hjørnet før
jobben og leser nyhetene på telefonen sin om kvelden lagde vi middag sammen
ris med fisk og grønne grønnsaker etterpå så vi en gammel film om sjøfolk
som gikk seg bort på havet naboene kom innom senere for å spille kort og
snakke om hagen sin som gir dem tomater bønner og epler hver høst neste år
håper de å bygge et lite drivhus slik at plantene kan vokse også i de kalde
månedene alle er enige om at våren er den beste årstiden her fordi dagene
blir lengre trærne blir grønne og hele byen dufter av ferskt brød fra
bakeriet på torget ingenting er bedre enn en søndagsettermiddag hjemme""",

"da": """i går morges tog min søster det tidlige tog til byen hvor hun
arbejder på et lille kontor nær havnen hun køber altid kaffe på hjørnet før
arbejdet og læser nyhederne på sin telefon om aftenen lavede vi aftensmad
sammen ris med fisk og grønne grøntsager bagefter så vi en gammel film om
søfolk der var faret vild på havet naboerne kom forbi senere for at spille
kort og snakke om deres have som giver dem tomater bønner og æbler hvert
efterår næste år håber de at bygge et lille drivhus så planterne kan vokse
selv i de kolde måneder alle er enige om at foråret er den bedste årstid
her fordi dagene bliver længere træerne bliver grønne og hele byen dufter
af friskbagt brød fra bageriet på torvet intet er bedre end en stille
søndag eftermiddag derhjemme med en kop te og en god bog uden tvivl er det
sådan at en sætning på dansk kan genkendes af enhver som har boet her i
nogen tid hvad enten man er født i landet eller ej det er ikke nogen
hemmelighed at sproget kan være svært at udtale men det burde ikke være
noget problem at læse det øjeblikket efter man har lært de særlige
bogstaver æ ø og å kan man begynde at forstå aviserne og bøgerne uden
besvær og efterhånden også samtalerne henover frokostbordet""",

"fi": """eilen aamulla siskoni otti aikaisen junan kaupunkiin jossa hän
työskentelee pienessä toimistossa sataman lähellä hän ostaa aina kahvin
kulmasta ennen töitä ja lukee uutiset puhelimestaan illalla laitoimme
yhdessä ruokaa riisiä kalan ja vihreiden vihannesten kanssa sitten
katsoimme vanhan elokuvan merimiehistä jotka eksyivät merellä naapurit
tulivat myöhemmin pelaamaan korttia ja puhumaan puutarhastaan joka antaa
heille tomaatteja papuja ja omenoita joka syksy ensi vuonna he toivovat
rakentavansa pienen kasvihuoneen jotta kasvit voivat kasvaa myös kylminä
kuukausina kaikki ovat samaa mieltä siitä että kevät on paras vuodenaika
täällä koska päivät pitenevät puut tulevat vihreiksi ja koko kaupunki
tuoksuu tuoreelta leivältä torin leipomosta""",

"pl": """wczoraj rano moja siostra pojechała wczesnym pociągiem do miasta
gdzie pracuje w małym biurze niedaleko portu zawsze kupuje kawę na rogu
przed pracą i czyta wiadomości w telefonie wieczorem gotowaliśmy razem
kolację ryż z rybą i zielonymi warzywami potem oglądaliśmy stary film o
marynarzach zagubionych na morzu sąsiedzi przyszli później zagrać w karty i
porozmawiać o swoim ogrodzie który daje im pomidory fasolę i jabłka każdej
jesieni w przyszłym roku mają nadzieję zbudować małą szklarnię żeby rośliny
mogły rosnąć nawet w zimnych miesiącach wszyscy zgadzają się że wiosna jest
tutaj najlepszą porą roku ponieważ dni stają się dłuższe drzewa zielenieją
a całe miasto pachnie świeżym chlebem z piekarni na głównym placu""",

"cs": """včera ráno jela moje sestra časným vlakem do města kde pracuje v
malé kanceláři blízko přístavu vždycky si koupí kávu na rohu před prací a
čte si zprávy v telefonu večer jsme spolu vařili večeři rýži s rybou a
zelenou zeleninou potom jsme se dívali na starý film o námořnících
ztracených na moři sousedé přišli později zahrát si karty a popovídat si o
své zahradě která jim každý podzim dává rajčata fazole a jablka příští rok
doufají že postaví malý skleník aby rostliny mohly růst i v chladných
měsících všichni se shodují že jaro je tady nejlepší roční období protože
dny se prodlužují stromy se zelenají a celé město voní čerstvým chlebem z
pekárny na hlavním náměstí není nic lepšího než tichá neděle doma přemýšlím o tom jak řeka teče přes kameny a jak se v ní zrcadlí
obloha když jsem byl ještě malý chodili jsme s dědečkem k rybníku kde
kvákaly žáby a nad hladinou létaly vážky říkal mi že příroda je největší
učitelka protože všechno co potřebujeme vědět už někde napsala čeština má
krásná slova jako příliš žluťoučký kůň úpěl ďábelské ódy a právě háčky a
čárky dělají náš jazyk zvláštním večer jsme si vařili čaj a povídali si o
tom co budeme dělat zítra jestli půjdeme do města nebo zůstaneme doma u
kamen kde praská dřevo a voní chléb který upekla babička toto je přesně ten
okamžik kdy si člověk uvědomí že všechno je tak jak má být toto není jen
obyčejný den je to den kdy se rozhoduje o všem co bude dál věta kterou
jsem slyšel byla zcela jasná a každý kdo ji slyšel by měl rozumět bez
jakéhokoli problému že jde o důležitou zprávu""",

"sk": """včera ráno išla moja sestra skorým vlakom do mesta kde pracuje v
malej kancelárii blízko prístavu vždy si kúpi kávu na rohu pred prácou a
číta si správy v telefóne večer sme spolu varili večeru ryžu s rybou a
zelenou zeleninou potom sme pozerali starý film o námorníkoch stratených na
mori susedia prišli neskôr zahrať si karty a porozprávať sa o svojej
záhrade ktorá im každú jeseň dáva paradajky fazuľu a jablká budúci rok
dúfajú že postavia malý skleník aby rastliny mohli rásť aj v chladných
mesiacoch všetci sa zhodujú že jar je tu najlepšie ročné obdobie pretože
dni sa predlžujú stromy sa zelenajú a celé mesto vonia čerstvým chlebom z
pekárne na hlavnom námestí nie je nič lepšie ako tichá nedeľa doma""",

"hu": """tegnap reggel a nővérem a korai vonattal ment a városba ahol egy
kis irodában dolgozik a kikötő közelében mindig vesz egy kávét a sarkon a
munka előtt és a telefonján olvassa a híreket este együtt főztünk vacsorát
rizst hallal és zöld zöldségekkel aztán megnéztünk egy régi filmet a
tengeren eltévedt tengerészekről a szomszédok később átjöttek kártyázni és
beszélgetni a kertjükről amely minden ősszel paradicsomot babot és almát ad
nekik jövőre remélik hogy építenek egy kis üvegházat hogy a növények a
hideg hónapokban is nőhessenek mindenki egyetért abban hogy a tavasz itt a
legszebb évszak mert a napok hosszabbodnak a fák kizöldülnek és az egész
város friss kenyér illatú a főtéri pékségből""",

"ro": """ieri dimineață sora mea a luat trenul de dimineață spre oraș unde
lucrează într un birou mic lângă port întotdeauna cumpără o cafea de la
colț înainte de muncă și citește știrile pe telefon seara am gătit împreună
cina orez cu pește și legume verzi apoi am văzut un film vechi despre
marinari pierduți pe mare vecinii au venit mai târziu să joace cărți și să
vorbească despre grădina lor care le dă roșii fasole și mere în fiecare
toamnă anul viitor speră să construiască o mică seră pentru ca plantele să
poată crește chiar și în lunile reci toată lumea este de acord că primăvara
este cel mai frumos anotimp aici pentru că zilele devin mai lungi copacii
înverzesc și tot orașul miroase a pâine proaspătă de la brutăria din piață""",

"tr": """dün sabah kız kardeşim erken trenle şehre gitti orada limanın
yakınındaki küçük bir ofiste çalışıyor işten önce her zaman köşeden kahve
alır ve telefonundan haberleri okur akşam birlikte yemek pişirdik balıklı
pirinç ve yeşil sebzeler sonra denizde kaybolan denizciler hakkında eski
bir film izledik komşular daha sonra kart oynamak ve her sonbahar onlara
domates fasulye ve elma veren bahçeleri hakkında konuşmak için geldiler
gelecek yıl bitkilerin soğuk aylarda bile büyüyebilmesi için küçük bir sera
kurmayı umuyorlar herkes baharın burada en güzel mevsim olduğu konusunda
hemfikir çünkü günler uzuyor ağaçlar yeşeriyor ve bütün şehir meydandaki
fırından gelen taze ekmek kokuyor""",

"id": """kemarin pagi kakak perempuan saya naik kereta pagi ke kota tempat
dia bekerja di sebuah kantor kecil dekat pelabuhan dia selalu membeli kopi
di sudut jalan sebelum bekerja dan membaca berita di ponselnya malam
harinya kami memasak makan malam bersama nasi dengan ikan dan sayuran hijau
lalu kami menonton film lama tentang pelaut yang tersesat di laut para
tetangga datang kemudian untuk bermain kartu dan berbicara tentang kebun
mereka yang memberi mereka tomat kacang dan apel setiap musim gugur tahun
depan mereka berharap membangun rumah kaca kecil supaya tanaman bisa tumbuh
bahkan selama bulan bulan dingin semua orang setuju bahwa musim semi adalah
musim terbaik di sini karena hari menjadi lebih panjang pohon pohon
menghijau dan seluruh kota berbau roti segar dari toko roti di alun alun saya sedang memikirkan bagaimana caranya bisa pergi ke pasar
besok pagi karena sepeda saya rusak kemarin sore teman saya bilang dia
tidak bisa meminjamkan sepedanya sebab akan dipakai adiknya untuk sekolah
kalau begitu saya harus jalan kaki saja atau naik angkutan umum yang
lewat depan rumah setiap setengah jam orang orang di kampung kami sangat
ramah mereka selalu menyapa ketika bertemu di jalan dan sering berbagi
makanan ketika ada acara keluarga bulan depan akan ada pesta panen di
desa dan semua warga akan berkumpul untuk makan bersama menonton
pertunjukan wayang dan mendengarkan musik gamelan sampai larut malam""",

"ms": """semalam pagi kakak saya menaiki kereta api awal ke bandar tempat
dia bekerja di sebuah pejabat kecil berhampiran pelabuhan dia selalu
membeli kopi di selekoh jalan sebelum kerja dan membaca berita di telefon
bimbitnya pada waktu malam kami memasak makan malam bersama nasi dengan
ikan dan sayur sayuran hijau kemudian kami menonton filem lama tentang
pelaut yang sesat di lautan jiran jiran datang kemudian untuk bermain
daun terup dan berbual tentang kebun mereka yang memberi mereka tomato
kacang dan epal setiap musim luruh tahun hadapan mereka berharap dapat
membina rumah hijau kecil supaya tumbuhan boleh membesar walaupun semasa
bulan bulan sejuk semua orang bersetuju bahawa musim bunga ialah musim
terbaik di sini kerana hari semakin panjang dan seluruh bandar berbau roti petang semalam saya pergi ke kedai runcit berhampiran rumah
untuk membeli barang keperluan dapur seperti beras gula dan minyak masak
penjaga kedai itu sangat peramah dan selalu bertanya khabar tentang
keluarga kami musim hujan akan tiba tidak lama lagi jadi kami perlu
membaiki bumbung rumah yang bocor sebelum hujan lebat turun setiap petang
kanak kanak di taman permainan bermain bola sepak dan layang layang
sehingga matahari terbenam ibu bapa mereka duduk berbual di bangku sambil
minum teh tarik dan makan kuih muih pada hari minggu kami sekeluarga
selalu pergi ke pasar malam untuk membeli sate nasi lemak dan cendol""",

"nl": """gisterochtend nam mijn zus de vroege trein naar de stad waar ze
werkt op een klein kantoor dicht bij de haven ze koopt altijd koffie op de
hoek voor het werk en leest het nieuws op haar telefoon s avonds kookten we
samen het avondeten rijst met vis en groene groenten daarna keken we naar
een oude film over zeelieden die verdwaald waren op zee de buren kwamen
later langs om te kaarten en te praten over hun tuin die hun elke herfst
tomaten bonen en appels geeft volgend jaar hopen ze een kleine kas te
bouwen zodat de planten ook in de koude maanden kunnen groeien iedereen is
het erover eens dat de lente hier het mooiste seizoen is omdat de dagen
langer worden de bomen groen worden en de hele stad naar vers brood ruikt""",

"ru": """вчера утром моя сестра поехала ранним поездом в город где она
работает в маленьком офисе недалеко от порта она всегда покупает кофе на
углу перед работой и читает новости в телефоне вечером мы вместе готовили
ужин рис с рыбой и зелёными овощами потом смотрели старый фильм о моряках
потерявшихся в море соседи пришли позже поиграть в карты и поговорить о
своём огороде который каждую осень даёт им помидоры фасоль и яблоки в
следующем году они надеются построить маленькую теплицу чтобы растения
могли расти даже в холодные месяцы все согласны что весна здесь лучшее
время года потому что дни становятся длиннее деревья зеленеют и весь город
пахнет свежим хлебом из пекарни на главной площади ничего нет лучше тихого
воскресенья дома с чашкой чая и хорошей книгой""",

"uk": """вчора вранці моя сестра поїхала раннім потягом до міста де вона
працює в маленькому офісі недалеко від порту вона завжди купує каву на
розі перед роботою і читає новини в телефоні ввечері ми разом готували
вечерю рис із рибою та зеленими овочами потім дивилися старий фільм про
моряків що заблукали в морі сусіди прийшли пізніше пограти в карти та
поговорити про свій город який щоосені дає їм помідори квасолю та яблука
наступного року вони сподіваються побудувати маленьку теплицю щоб рослини
могли рости навіть у холодні місяці всі згодні що весна тут найкраща пора
року бо дні стають довшими дерева зеленіють і все місто пахне свіжим
хлібом із пекарні на головній площі немає нічого кращого за тиху неділю
вдома з чашкою чаю та гарною книжкою у нашій країні є багато гарних міст і сіл де живуть люди які
люблять свою землю щороку навесні вони садять городину а влітку збирають
ягоди та гриби у лісі діти ходять до школи вчаться читати й писати а
ввечері граються на подвір'ї біля хати бабуся розповідає онукам казки про
котика й півника про лисичку та вовка а дідусь грає на сопілці українські
пісні коли настає свято вся родина збирається за столом де є борщ
вареники та узвар і всі співають разом бо пісня єднає людей і дає їм силу
жити далі навіть у важкі часи кожен знає що рідна мова це скарб який
треба берегти й передавати дітям і онукам""",

"bg": """вчера сутринта сестра ми взе ранния влак за града където работи в
малък офис близо до пристанището тя винаги си купува кафе на ъгъла преди
работа и чете новините на телефона си вечерта готвихме заедно вечеря ориз
с риба и зелени зеленчуци после гледахме стар филм за моряци изгубени в
морето съседите дойдоха по късно да играят карти и да говорят за градината
си която всяка есен им дава домати боб и ябълки догодина се надяват да
построят малка оранжерия за да могат растенията да растат дори през
студените месеци всички са съгласни че пролетта е най хубавият сезон тук
защото дните стават по дълги дърветата се раззеленяват и целият град
мирише на пресен хляб от пекарната на главния площад""",

"sr": """јуче ујутру моја сестра је узела рани воз за град где ради у малој
канцеларији близу луке она увек купује кафу на углу пре посла и чита вести
на телефону увече смо заједно кували вечеру пиринач са рибом и зеленим
поврћем затим смо гледали стари филм о морнарима изгубљеним на мору комшије
су дошле касније да играју карте и разговарају о својој башти која им сваке
јесени даје парадајз пасуљ и јабуке следеће године се надају да ће изградити
мали стакленик како би биљке могле да расту чак и током хладних месеци сви
се слажу да је пролеће овде најлепше годишње доба јер дани постају дужи
дрвеће се зелени и цео град мирише на свеж хлеб из пекаре на главном тргу""",

"mk": """вчера наутро сестра ми го зеде раниот воз за градот каде што работи
во мала канцеларија близу пристаништето таа секогаш купува кафе на аголот
пред работа и ги чита вестите на телефонот навечер заедно готвевме вечера
ориз со риба и зелен зеленчук потоа гледавме стар филм за морнари изгубени
на море соседите дојдоа подоцна да играат карти и да зборуваат за својата
градина која секоја есен им дава домати грав и јаболка догодина се
надеваат дека ќе изградат мала стаклена градина за да можат растенијата да
растат дури и во студените месеци сите се согласуваат дека пролетта е
најубавото годишно време тука бидејќи деновите стануваат подолги
нашиот учител ни кажа дека јазикот е жива работа и дека секој збор има
своја приказна луѓето во градот зборуваат брзо но јас повеќе ја сакам
смирената реч на моето село каде што бабите седат пред куќите и
раскажуваат за она што било некогаш ќе дојде време кога и ние ќе им
кажуваме на нашите деца какви биле летата порано колку биле длабоки
снеговите и како мирисал лебот од фурната никој не може да каже што
носи утрешниот ден но важно е да се биде добар човек и да се помага
секому кој ќе побара помош затоа што добрината секогаш се враќа""",

"be": """учора раніцай мая сястра паехала раннім цягніком у горад дзе яна
працуе ў маленькім офісе недалёка ад порта яна заўсёды купляе каву на рагу
перад працай і чытае навіны ў тэлефоне увечары мы разам гатавалі вячэру
рыс з рыбай і зялёнай гароднінай потым глядзелі стары фільм пра маракоў
якія заблукалі ў моры суседзі прыйшлі пазней пагуляць у карты і пагаварыць
пра свой агарод які кожную восень дае ім памідоры фасолю і яблыкі у
наступным годзе яны спадзяюцца пабудаваць маленькую цяпліцу каб расліны
маглі расці нават у халодныя месяцы усе згодныя што вясна тут найлепшая
пара года бо дні становяцца даўжэйшымі дрэвы зелянеюць і ўвесь горад пахне
свежым хлебам з пякарні на галоўнай плошчы""",

"ar": """في الصباح الباكر من يوم أمس ركبت أختي القطار إلى المدينة حيث تعمل
في مكتب صغير قرب الميناء وهي تشتري دائما قهوة من الزاوية قبل العمل وتقرأ
الأخبار على هاتفها وفي المساء طبخنا العشاء معا أرزا مع السمك والخضروات
الخضراء ثم شاهدنا فيلما قديما عن بحارة ضاعوا في البحر وجاء الجيران لاحقا
للعب الورق والحديث عن حديقتهم التي تعطيهم الطماطم والفاصوليا والتفاح في كل
خريف وفي العام القادم يأملون أن يبنوا بيتا زجاجيا صغيرا حتى تستطيع
النباتات أن تنمو حتى في الشهور الباردة والجميع متفقون على أن الربيع هو
أجمل فصل هنا لأن الأيام تصبح أطول والأشجار تخضر والمدينة كلها تفوح منها
رائحة الخبز الطازج من المخبز في الساحة الرئيسية ولا شيء أجمل من يوم هادئ
في البيت مع كوب من الشاي وكتاب جيد بينما الريح تهب في الخارج""",

"fa": """دیروز صبح زود خواهرم با قطار به شهر رفت جایی که در یک دفتر کوچک
نزدیک بندر کار می کند او همیشه پیش از کار از گوشه خیابان قهوه می خرد و
اخبار را در تلفن همراهش می خواند شب با هم شام پختیم برنج با ماهی و سبزیجات
سبز سپس فیلمی قدیمی درباره ملوانانی که در دریا گم شده بودند تماشا کردیم
همسایه ها بعدا آمدند تا ورق بازی کنند و درباره باغچه شان صحبت کنند که هر
پاییز به آنها گوجه فرنگی لوبیا و سیب می دهد سال آینده امیدوارند یک گلخانه
کوچک بسازند تا گیاهان بتوانند حتی در ماه های سرد رشد کنند همه موافقند که
بهار زیباترین فصل اینجاست چون روزها بلندتر می شوند درختان سبز می شوند و
تمام شهر بوی نان تازه از نانوایی میدان اصلی می دهد هیچ چیز بهتر از یک روز
آرام در خانه با یک فنجان چای و کتابی خوب نیست""",

"ur": """کل صبح سویرے میری بہن ریل گاڑی سے شہر گئی جہاں وہ بندرگاہ کے قریب
ایک چھوٹے دفتر میں کام کرتی ہے وہ کام سے پہلے ہمیشہ نکڑ سے کافی خریدتی ہے
اور اپنے فون پر خبریں پڑھتی ہے شام کو ہم نے مل کر کھانا پکایا مچھلی کے
ساتھ چاول اور ہری سبزیاں پھر ہم نے سمندر میں کھوئے ہوئے ملاحوں کے بارے
میں ایک پرانی فلم دیکھی پڑوسی بعد میں تاش کھیلنے اور اپنے باغ کے بارے میں
بات کرنے آئے جو ہر خزاں میں انہیں ٹماٹر پھلیاں اور سیب دیتا ہے اگلے سال
وہ امید کرتے ہیں کہ ایک چھوٹا سبز خانہ بنائیں گے تاکہ پودے سرد مہینوں میں
بھی بڑھ سکیں سب اس بات پر متفق ہیں کہ بہار یہاں کا سب سے خوبصورت موسم ہے
کیونکہ دن لمبے ہو جاتے ہیں درخت ہرے ہو جاتے ہیں اور سارا شہر تازہ روٹی کی
خوشبو سے بھر جاتا ہے""",

"hi": """कल सुबह मेरी बहन जल्दी वाली रेलगाड़ी से शहर गई जहां वह बंदरगाह के
पास एक छोटे दफ्तर में काम करती है वह काम से पहले हमेशा नुक्कड़ से कॉफी
खरीदती है और अपने फोन पर खबरें पढ़ती है शाम को हमने साथ मिलकर खाना बनाया
मछली के साथ चावल और हरी सब्जियां फिर हमने समुद्र में खोए नाविकों के बारे
में एक पुरानी फिल्म देखी पड़ोसी बाद में ताश खेलने और अपने बगीचे के बारे
में बात करने आए जो हर पतझड़ में उन्हें टमाटर सेम और सेब देता है अगले साल
वे उम्मीद करते हैं कि एक छोटा शीशघर बनाएंगे ताकि पौधे ठंडे महीनों में भी
बढ़ सकें सब इस बात से सहमत हैं कि वसंत यहां का सबसे सुंदर मौसम है क्योंकि
दिन लंबे हो जाते हैं पेड़ हरे हो जाते हैं और पूरा शहर ताजा रोटी की खुशबू
से भर जाता है""",

"vi": """sáng hôm qua chị gái tôi đã đi chuyến tàu sớm đến thành phố nơi chị
làm việc trong một văn phòng nhỏ gần bến cảng chị luôn mua cà phê ở góc phố
trước giờ làm và đọc tin tức trên điện thoại buổi tối chúng tôi cùng nhau
nấu bữa tối cơm với cá và rau xanh sau đó chúng tôi xem một bộ phim cũ về
những thủy thủ lạc trên biển hàng xóm đến chơi bài muộn hơn và nói chuyện
về khu vườn của họ nơi cho họ cà chua đậu và táo mỗi mùa thu năm sau họ hy
vọng xây một nhà kính nhỏ để cây cối có thể lớn lên ngay cả trong những
tháng lạnh mọi người đều đồng ý rằng mùa xuân là mùa đẹp nhất ở đây vì
ngày dài hơn cây cối xanh tươi và cả thành phố thơm mùi bánh mì mới""",

"zh": """昨天早上我的姐姐坐早班火车去城里她在港口附近的一间小办公室工作上班前她
总是在街角买咖啡然后在手机上看新闻晚上我们一起做了晚饭米饭配鱼和绿色蔬菜然后我
们看了一部关于在海上迷路的水手的老电影邻居们后来过来打牌聊他们的菜园每年秋天那
里都会给他们西红柿豆子和苹果明年他们希望建一个小温室这样植物在寒冷的月份也能生
长大家都同意春天是这里最美的季节因为白天变长树木变绿整个城市都闻得到广场面包店
里新鲜面包的香味没有什么比安静的周日下午在家里喝茶看书更好的了""",

"zh-Hant": """昨天早上我的姊姊搭早班火車進城她在港口附近的一間小辦公室工作上班
前她總是在街角買咖啡然後在手機上看新聞晚上我們一起做了晚飯米飯配魚和綠色蔬菜然
後我們看了一部關於在海上迷路的水手的老電影鄰居們後來過來打牌聊他們的菜園每年秋
天那裡都會給他們番茄豆子和蘋果明年他們希望蓋一個小溫室這樣植物在寒冷的月份也能
生長大家都同意春天是這裡最美的季節因為白天變長樹木變綠整個城市都聞得到廣場麵包
店裡新鮮麵包的香味沒有什麼比安靜的週日下午在家裡喝茶看書更好的了""",

"ja": """きのうの朝わたしの姉は早い電車で町へ行きました姉は港の近くの小さな事務
所で働いています仕事の前にいつも角の店でコーヒーを買って電話でニュースを読みま
す夜はいっしょに晩ごはんを作りました魚と緑の野菜のごはんですそれから海で迷った
船乗りたちについての古い映画を見ました近所の人たちはあとでトランプをしに来て毎
年秋にトマトと豆とりんごをくれる庭について話しました来年は小さな温室を建てて寒
い月にも植物が育つようにしたいそうですみんな春がここでいちばん美しい季節だと言
います日が長くなり木が緑になり町じゅうが広場のパン屋の焼きたてのパンの香りでい
っぱいになるからです静かな日曜日の午後に家でお茶を飲みながら本を読むことほどよ
いものはありません""",

"ko": """어제 아침 언니는 이른 기차를 타고 도시에 갔습니다 언니는 항구 근처의
작은 사무실에서 일합니다 일 전에 언제나 모퉁이 가게에서 커피를 사고 전화로
뉴스를 읽습니다 저녁에는 함께 저녁을 만들었습니다 생선과 푸른 채소를 곁들인
밥이었습니다 그다음 바다에서 길을 잃은 선원들에 관한 오래된 영화를 보았습니다
이웃들은 나중에 카드 놀이를 하러 왔고 가을마다 토마토와 콩과 사과를 주는 그들의
텃밭에 대해 이야기했습니다 내년에는 작은 온실을 지어서 추운 달에도 식물이 자랄
수 있게 하기를 바랍니다 모두들 봄이 여기서 가장 아름다운 계절이라는 데
동의합니다 낮이 길어지고 나무가 푸르러지고 온 도시가 광장 빵집의 갓 구운 빵
냄새로 가득하기 때문입니다 조용한 일요일 오후에 집에서 차를 마시며 책을 읽는
것보다 좋은 것은 없습니다""",

}
